// Shim: the reference headers only use AES_BLOCK_SIZE from openssl/aes.h.
#pragma once
#define AES_BLOCK_SIZE 16
