"""fss_crypto-parity integration tests, mirroring reference
test/test_dpf_integration.py and test_dcf_integration.py (tensor contracts)
plus reconstruction correctness, which the reference checks only in gtest."""

import numpy as np
import pytest
import torch

from fss_tpu import crypto as fss_crypto


@pytest.fixture
def dpf():
    return fss_crypto.Dpf(in_bits=16, group="bytes", prg="chacha")


@pytest.fixture
def dcf():
    return fss_crypto.Dcf(in_bits=12, group="uint", prg="chacha", pred="lt")


@pytest.fixture
def s0s():
    g = torch.Generator().manual_seed(7)
    return torch.randint(-2**31, 2**31, (2, 4), dtype=torch.int32,
                         generator=g)


@pytest.fixture
def beta():
    return torch.tensor([604, 0, 0, 0], dtype=torch.int32)


class TestDpfGenShape:
    def test_cws_shape(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        assert cws.shape == (17, 8)
        assert cws.dtype == torch.int32

    def test_cws_device_is_cpu(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        assert cws.device.type == "cpu"


class TestDpfEvalShape:
    def test_output_shape_cpu(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        out = dpf.eval(party=0, s0=s0s[0], cws=cws, x=50)
        assert out.shape == (4,)
        assert out.dtype == torch.int32
        assert out.device.type == "cpu"

    def test_rejects_out_of_domain_x(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        with pytest.raises(ValueError, match="x must be"):
            dpf.eval(party=0, s0=s0s[0], cws=cws, x=2**16)


class TestDpfEvalAllShape:
    def test_output_shape(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        out = dpf.eval_all(party=0, s0=s0s[0], cws=cws)
        assert out.shape == (2**16, 4)
        assert out.dtype == torch.int32
        assert out.device.type == "cpu"


class TestDpfCorrectness:
    def test_point_function(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        y0 = dpf.eval(0, s0s[0], cws, 107)
        y1 = dpf.eval(1, s0s[1], cws, 107)
        beta_clamped = beta.clone()
        beta_clamped[3] &= ~1
        assert torch.equal(y0 ^ y1, beta_clamped)
        y0 = dpf.eval(0, s0s[0], cws, 106)
        y1 = dpf.eval(1, s0s[1], cws, 106)
        assert torch.equal(y0 ^ y1, torch.zeros(4, dtype=torch.int32))

    def test_batched_eval_extension(self, dpf, s0s, beta):
        cws = dpf.gen(s0s, alpha=107, beta=beta)
        xs = np.arange(256, dtype=np.uint32)
        y0 = dpf.eval(0, s0s[0], cws, xs)
        y1 = dpf.eval(1, s0s[1], cws, xs)
        rec = y0 ^ y1
        assert rec.shape == (256, 4)
        assert torch.all(rec[:107] == 0) and torch.all(rec[108:] == 0)

    def test_numpy_tensors(self, beta):
        d = fss_crypto.Dpf(in_bits=8, group="uint", prg="chacha")
        rng = np.random.default_rng(3)
        s0s = rng.integers(-2**31, 2**31, size=(2, 4)).astype(np.int32)
        cws = d.gen(s0s, 42, np.asarray(beta.numpy()))
        assert isinstance(cws, np.ndarray) and cws.dtype == np.int32
        y0 = d.eval(0, s0s[0], cws, 42).view(np.uint32)
        y1 = d.eval(1, s0s[1], cws, 42).view(np.uint32)
        assert (int(y0[0]) + int(y1[0])) % 2**32 == 604

    def test_aes128_mmo_prg(self, s0s, beta):
        d = fss_crypto.Dpf(in_bits=8, group="bytes", prg="aes128_mmo")
        cws = d.gen(s0s, 42, beta)
        y0 = d.eval(0, s0s[0], cws, 42)
        y1 = d.eval(1, s0s[1], cws, 42)
        beta_clamped = beta.clone()
        beta_clamped[3] &= ~1
        assert torch.equal(y0 ^ y1, beta_clamped)


class TestDcf:
    def test_shapes(self, dcf, s0s, beta):
        cws = dcf.gen(s0s, alpha=1000, beta=beta)
        assert cws.shape == (13, 8) and cws.dtype == torch.int32
        out = dcf.eval(party=1, s0=s0s[1], cws=cws, x=3)
        assert out.shape == (4,) and out.dtype == torch.int32
        all0 = dcf.eval_all(party=0, s0=s0s[0], cws=cws)
        assert all0.shape == (2**12, 4)

    def test_comparison_semantics(self, dcf, s0s, beta):
        alpha = 1000
        cws = dcf.gen(s0s, alpha=alpha, beta=beta)
        a0 = dcf.eval_all(0, s0s[0], cws).numpy().view(np.uint32)
        a1 = dcf.eval_all(1, s0s[1], cws).numpy().view(np.uint32)
        rec = (a0.astype(np.uint64) + a1.astype(np.uint64)) % 2**32
        assert np.all(rec[:alpha, 0] == 604)
        assert np.all(rec[alpha:, 0] == 0)

    def test_gt_pred(self, s0s, beta):
        d = fss_crypto.Dcf(in_bits=8, group="uint", prg="chacha", pred="gt")
        alpha = 100
        cws = d.gen(s0s, alpha=alpha, beta=beta)
        a0 = d.eval_all(0, s0s[0], cws).numpy().view(np.uint32)
        a1 = d.eval_all(1, s0s[1], cws).numpy().view(np.uint32)
        rec = (a0.astype(np.uint64) + a1.astype(np.uint64)) % 2**32
        assert np.all(rec[:alpha + 1, 0] == 0)
        assert np.all(rec[alpha + 1:, 0] == 604)
