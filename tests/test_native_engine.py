"""Native host (latency-tier) engine parity tests.

The adaptive proof engine (ops/engine.py, config.proof_engine) routes
sub-threshold work through the native C++ runtime: batch NTT, the
quotient bytecode VM and the Pippenger commits. Every result must be
BIT-IDENTICAL to the XLA path — same exact field arithmetic, different
executor — mirroring the device/host cross-checks the reference gets for
free from running everything in one Rust process."""

import random

import pytest

from battlezips_halo2_tpu import native
from battlezips_halo2_tpu.fields.host import FP
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

pytestmark = pytest.mark.skipif(not native.available(), reason="native runtime unavailable")

P = FP.modulus


class TestNativeTransforms:
    """csrc/pasta.cpp pasta_ntt_batch / pasta_scale_batch vs the exact
    host NTT (poly/domain.py)."""

    def test_ntt_matches_host(self):
        rng = random.Random(11)
        for k in (3, 8, 11):
            n = 1 << k
            dom = EvaluationDomain(k, 2)
            vals = [rng.randrange(P) for _ in range(n)]
            data = native.ints_to_bytes_arr(vals).reshape(1, n, 32)
            native.ntt_batch(native.FIELD_FP, data, dom.omega)
            assert native.bytes_arr_to_ints(data.reshape(n, 32)) == ntt_host(vals, dom.omega)

    def test_intt_round_trip_with_scale(self):
        rng = random.Random(12)
        n = 1 << 9
        dom = EvaluationDomain(9, 2)
        vals = [rng.randrange(P) for _ in range(n)]
        data = native.ints_to_bytes_arr(vals).reshape(1, n, 32)
        native.ntt_batch(native.FIELD_FP, data, dom.omega)
        native.ntt_batch(native.FIELD_FP, data, pow(dom.omega, -1, P))
        native.scale_batch(native.FIELD_FP, data, 1, pow(n, -1, P))
        assert native.bytes_arr_to_ints(data.reshape(n, 32)) == vals

    def test_coset_scale(self):
        rng = random.Random(13)
        n = 64
        g = FP.generator
        vals = [rng.randrange(P) for _ in range(n)]
        data = native.ints_to_bytes_arr(vals).reshape(1, n, 32)
        native.scale_batch(native.FIELD_FP, data, g, 5)
        got = native.bytes_arr_to_ints(data.reshape(n, 32))
        assert got == [v * 5 * pow(g, i, P) % P for i, v in enumerate(vals)]

    def test_batch_transforms_route_native(self, monkeypatch):
        """poly/transforms.py _maybe_native vs the XLA path, bit-exact for
        all four basis transforms."""
        from battlezips_halo2_tpu.poly import transforms as T

        rng = random.Random(14)
        dom = EvaluationDomain(6, 3)
        cols = [[rng.randrange(P) for _ in range(dom.n)] for _ in range(3)]
        monkeypatch.setenv("BZ_PROOF_ENGINE", "host")
        host_coeffs = T.batch_lagrange_to_coeff(dom, cols)
        host_vals = T.batch_coeff_to_lagrange(dom, host_coeffs)
        host_ext = T.batch_coeff_to_extended(dom, host_coeffs)
        host_back = T.batch_extended_to_coeff(dom, host_ext)
        monkeypatch.setenv("BZ_PROOF_ENGINE", "device")
        dev_coeffs = T.batch_lagrange_to_coeff(dom, cols)
        assert host_coeffs == dev_coeffs
        assert host_vals == cols
        assert host_ext == T.batch_coeff_to_extended(dom, host_coeffs)
        assert [p[: dom.n] for p in host_back] == host_coeffs


class TestNativeProofParity:
    """Proof bytes through the host engine == proof bytes through the
    device (XLA) engine, seed for seed."""

    def _mul_proof(self, monkeypatch, engine: str) -> bytes:
        from battlezips_halo2_tpu.pcs.ipa import Params
        from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof
        from test_prover import MulCircuit

        monkeypatch.setenv("BZ_PROOF_ENGINE", engine)
        params = Params.new(5)
        pk = keygen(params, MulCircuit(1, 1, 1))
        proof = create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], random.Random(7))
        assert verify_proof(params, pk.vk, proof, [[15]])
        return proof

    def test_host_and_device_proof_bytes_identical(self, monkeypatch):
        host = self._mul_proof(monkeypatch, "host")
        device = self._mul_proof(monkeypatch, "device")
        assert host == device

    def test_native_quotient_matches_device_vm(self, monkeypatch):
        """NativeQuotientEvaluator and the device VM run the same bytecode;
        compare their h outputs directly for one challenge set."""
        from battlezips_halo2_tpu.ops.gate_eval import QuotientEvaluator
        from battlezips_halo2_tpu.ops.native_quotient import NativeQuotientEvaluator
        from battlezips_halo2_tpu.pcs.ipa import Params
        from battlezips_halo2_tpu.plonk import keygen
        from battlezips_halo2_tpu.plonk.arguments import ProofSchedule
        from test_prover import MulCircuit

        params = Params.new(5)
        pk = keygen(params, MulCircuit(1, 1, 1))
        schedule = ProofSchedule.build(pk.vk.cs)
        dev = QuotientEvaluator(pk.vk, schedule)
        nat = NativeQuotientEvaluator(pk.vk, schedule)
        assert dev.vm_size == nat.vm_size
        rng = random.Random(21)
        polys = {k: [rng.randrange(P) for _ in range(params.n)] for k in dev.keys}
        chals = tuple(rng.randrange(P) for _ in range(4))
        assert nat(polys, chals) == dev(polys, chals)


class TestNativeConstants:
    def test_quotient_constants_native_matches_python(self, monkeypatch):
        """_quotient_constants_native vs the object-array branch, value for
        value (l0/llast/lactive/x/t_inv over the extended coset)."""
        from battlezips_halo2_tpu import native as nat_mod
        from battlezips_halo2_tpu.ops import gate_eval as G
        from battlezips_halo2_tpu.pcs.ipa import Params
        from battlezips_halo2_tpu.plonk import keygen
        from test_prover import MulCircuit

        params = Params.new(5)
        pk = keygen(params, MulCircuit(1, 1, 1))
        got = G._quotient_constants_native(pk.vk)
        monkeypatch.setattr(nat_mod, "available", lambda: False)
        want = G.quotient_constants(pk.vk)
        for key in ("l0", "llast", "lactive", "x", "t_inv"):
            assert list(got[key]) == list(want[key]), key


class TestNativeVerifierKernels:
    """Round-5 verifier-latency kernels (csrc/pasta.cpp): batch point
    decompress, the IPA s-vector and the grand-product prefix, each
    cross-checked bit-exact against the authoritative host layer."""

    def test_point_decompress_matches_host(self):
        import numpy as np

        from battlezips_halo2_tpu import native
        from battlezips_halo2_tpu.curves import host as CH
        from battlezips_halo2_tpu.curves.host import VESTA
        from battlezips_halo2_tpu.fields.host import FP, FQ

        assert native.available()
        rng = random.Random(11)
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, FP.modulus)) for _ in range(24)]
        enc = b"".join(VESTA.to_bytes(p) for p in pts) + b"\x00" * 32
        xy, status, bad = native.point_decompress(native.which_for(FQ.modulus), enc)
        assert bad == -1
        for i, p in enumerate(pts):
            assert status[i] == 0
            x = int.from_bytes(xy[i][:32].tobytes(), "little")
            y = int.from_bytes(xy[i][32:].tobytes(), "little")
            assert (x, y) == p
        assert status[len(pts)] == 1  # identity encoding
        # malformed: non-canonical x, and x off-curve — both rejected with
        # the same semantics as Curve.from_bytes
        bad_x = FQ.modulus.to_bytes(32, "little")
        _, st, b = native.point_decompress(native.which_for(FQ.modulus), bad_x)
        assert b == 0 and st[0] == 2
        x = 1
        while FQ.sqrt((x**3 + 5) % FQ.modulus) is not None:
            x += 1
        _, st, b = native.point_decompress(
            native.which_for(FQ.modulus), x.to_bytes(32, "little")
        )
        assert b == 0 and st[0] == 2

    def test_from_bytes_native_equals_python(self):
        """Curve.from_bytes routes through the native decoder; the Python
        branch must agree byte-for-byte on points, identity and rejects."""
        from battlezips_halo2_tpu import native as nat_mod
        from battlezips_halo2_tpu.curves.host import VESTA
        from battlezips_halo2_tpu.fields.host import FP

        rng = random.Random(12)
        for _ in range(8):
            p = VESTA.mul(VESTA.generator, rng.randrange(1, FP.modulus))
            enc = VESTA.to_bytes(p)
            native_pt = VESTA.from_bytes(enc)
            try:
                orig = nat_mod.available
                nat_mod.available = lambda: False
                python_pt = VESTA.from_bytes(enc)
            finally:
                nat_mod.available = orig
            assert native_pt == python_pt == p

    def test_ipa_s_vector_matches_reference(self):
        from battlezips_halo2_tpu import native
        from battlezips_halo2_tpu.fields.host import FP

        m = FP.modulus
        rng = random.Random(13)
        k, n = 5, 32
        us = [rng.randrange(1, m) for _ in range(k)]
        a0 = rng.randrange(m)
        out = native.ipa_s_vector(native.which_for(m), us, a0, n)
        for i in range(n):
            exp = a0
            for j in range(k):
                if (i >> (k - 1 - j)) & 1:
                    exp = exp * us[j] % m
            assert int.from_bytes(out[i].tobytes(), "little") == exp

    def test_grand_product_matches_reference(self):
        from battlezips_halo2_tpu import native
        from battlezips_halo2_tpu.fields.host import FP

        m = FP.modulus
        rng = random.Random(14)
        usable = 60
        nums = [rng.randrange(1, m) for _ in range(usable)]
        dens = [rng.randrange(1, m) for _ in range(usable)]
        carry = rng.randrange(m)
        z = native.grand_product(
            native.which_for(m),
            native.ints_to_bytes_arr(nums),
            native.ints_to_bytes_arr(dens),
            carry,
        )
        acc = carry
        assert int.from_bytes(z[0].tobytes(), "little") == carry
        for i in range(usable):
            acc = acc * nums[i] % m * pow(dens[i], -1, m) % m
            assert int.from_bytes(z[i + 1].tobytes(), "little") == acc

    def test_window_fold_batch_matches_host(self):
        from battlezips_halo2_tpu import native
        from battlezips_halo2_tpu.curves.host import VESTA
        from battlezips_halo2_tpu.fields.host import FP
        from battlezips_halo2_tpu.ops.msm import fold_window_sums, host_window_fold

        rng = random.Random(21)
        c, w_count, b = 8, 11, 4
        flat = [
            None if rng.random() < 0.25 else VESTA.mul(VESTA.generator, rng.randrange(1, FP.modulus))
            for _ in range(b * w_count)
        ]
        got = fold_window_sums(VESTA, flat, b, w_count, c)
        want = [host_window_fold(VESTA, flat[i * w_count : (i + 1) * w_count], c) for i in range(b)]
        assert got == want
