// Host-compilation shim so g++ can build the reference CUDA headers
// (/root/reference/include/fss/*.cuh) without nvcc. Provides the minimal
// CUDA surface those headers touch on the host path: the int4 vector type,
// attribute macros as no-ops, and __trap. Everything the reference guards
// with __CUDA_ARCH__ is dead code here.
#pragma once
#include <stdint.h>     // nvcc's cuda_runtime.h transitively provides fixed-width ints
#include <sys/types.h>  // uint, used as the default In template parameter

struct int4 {
  int x, y, z, w;
};

#define __host__
#define __device__
#define __forceinline__ inline
#define __align__(n) alignas(n)

static inline void __trap() { __builtin_trap(); }
