"""Device kernel tests: NTT bit-exactness vs host, MSM vs host reference."""

import random

import numpy as np
import pytest

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    affine_to_jacobian_host,
    jacobian_to_affine_host,
    point_add,
    point_double,
)
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import ntt as D
from battlezips_halo2_tpu.ops.msm import msm, scalars_to_digits
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host


class TestNtt:
    def test_device_ntt_bit_exact(self):
        dom = EvaluationDomain(8, 9)
        rng = random.Random(0)
        vals = [rng.randrange(FP.modulus) for _ in range(dom.n)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        a = L.to_mont(FP_SPEC, ints_to_limbs(vals))
        got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, D.ntt(plan, a))))
        assert got == ntt_host(vals, dom.omega)

    def test_intt_roundtrip(self):
        dom = EvaluationDomain(7, 9)
        rng = random.Random(1)
        vals = [rng.randrange(FP.modulus) for _ in range(dom.n)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        plan_inv = D.plan_for(FP.modulus, dom.n, dom.omega_inv)
        n_inv = L.int_to_limbs(FP.inv(dom.n) * FP_SPEC.r_mod_p % FP.modulus)
        a = L.to_mont(FP_SPEC, ints_to_limbs(vals))
        back = L.from_mont(FP_SPEC, D.intt(plan_inv, D.ntt(plan, a), n_inv))
        assert limbs_to_ints(np.asarray(back)) == vals

    def test_batched_ntt(self):
        dom = EvaluationDomain(5, 9)
        rng = random.Random(2)
        batch = [[rng.randrange(FP.modulus) for _ in range(dom.n)] for _ in range(3)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        a = L.to_mont(FP_SPEC, np.stack([ints_to_limbs(b) for b in batch]))
        out = np.asarray(L.from_mont(FP_SPEC, D.ntt(plan, a)))
        for i, b in enumerate(batch):
            assert limbs_to_ints(out[i]) == ntt_host(b, dom.omega)


class TestJacobian:
    def test_add_double_identity(self):
        spec = FieldSpec.make(VESTA.base.modulus)
        rng = random.Random(1)
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**9)) for _ in range(4)]
        jac = affine_to_jacobian_host(spec, pts)
        assert jacobian_to_affine_host(spec, point_add(spec, jac, jac)) == [VESTA.double(p) for p in pts]
        assert jacobian_to_affine_host(spec, point_double(spec, jac)) == [VESTA.double(p) for p in pts]
        mixed = affine_to_jacobian_host(spec, [pts[0], None, pts[2], VESTA.neg(pts[3])])
        got = jacobian_to_affine_host(spec, point_add(spec, jac, mixed))
        assert got == [VESTA.double(pts[0]), pts[1], VESTA.double(pts[2]), None]


class TestMsm:
    def test_digits(self):
        d = scalars_to_digits([0x1FF, 1], c=8)
        assert d[0, 0] == 0xFF and d[1, 0] == 1 and d[0, 1] == 1

    def test_msm_vs_host(self):
        rng = random.Random(7)
        n = 32
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]
        scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
        scalars[0] = 0
        pts[1] = None
        assert msm(VESTA, pts, scalars) == VESTA.msm(pts, scalars)

    @pytest.mark.parametrize("emit", ["dense", "scatter"])
    def test_msm_emit_modes_vs_host(self, emit, monkeypatch):
        """Bucket-emit variants (BZ_MSM_EMIT): the dense scan-output +
        sort-compaction path and the per-step scatter path must both match
        the host Pippenger (unsigned c=8 path — the signed graph is
        CPU-compile-pathological and is covered on TPU by the bench gate
        and tools/verify_drive.py)."""
        monkeypatch.setenv("BZ_MSM_EMIT", emit)
        rng = random.Random(11)
        n = 512
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**14)) for _ in range(n)]
        scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
        scalars[5] = 0
        pts[7] = None
        assert msm(VESTA, pts, scalars, force_device=True) == VESTA.msm(pts, scalars)


class TestMixedAdd:
    """Edge cases of the affine-operand addition laws used by the MSM
    bucket scan (curves/limb.py point_add_mixed{,_incomplete})."""

    def _cases(self):
        G = VESTA.generator
        P1 = VESTA.mul(G, 12345)
        Q1 = VESTA.mul(G, 777)
        return [
            (P1, Q1),  # generic
            (P1, P1),  # doubling (incomplete law flags this)
            (P1, (P1[0], (-P1[1]) % VESTA.base.modulus)),  # inverse -> infinity
            (None, Q1),  # P at infinity
            (P1, None),  # Q at infinity
            (None, None),
        ]

    def _pack_q(self, spec, qs):
        import jax.numpy as jnp

        r, m = spec.r_mod_p, spec.modulus
        qx = jnp.asarray(np.stack([L.int_to_limbs((q[0] * r % m) if q else r) for q in qs]))
        qy = jnp.asarray(np.stack([L.int_to_limbs((q[1] * r % m) if q else r) for q in qs]))
        qinf = jnp.asarray(np.array([q is None for q in qs]))
        return qx, qy, qinf

    def test_mixed_add_complete(self):
        from battlezips_halo2_tpu.curves.limb import point_add_mixed

        spec = FieldSpec.make(VESTA.base.modulus)
        cases = self._cases()
        ps = affine_to_jacobian_host(spec, [c[0] for c in cases])
        qx, qy, qinf = self._pack_q(spec, [c[1] for c in cases])
        got = jacobian_to_affine_host(spec, point_add_mixed(spec, ps, qx, qy, qinf))
        assert got == [VESTA.add(p, q) for p, q in cases]

    def test_mixed_add_incomplete_flags_doubling_only(self):
        from battlezips_halo2_tpu.curves.limb import point_add_mixed_incomplete

        spec = FieldSpec.make(VESTA.base.modulus)
        cases = self._cases()
        ps = affine_to_jacobian_host(spec, [c[0] for c in cases])
        qx, qy, qinf = self._pack_q(spec, [c[1] for c in cases])
        out, flag = point_add_mixed_incomplete(spec, ps, qx, qy, qinf)
        got = jacobian_to_affine_host(spec, out)
        flags = list(np.asarray(flag))
        for i, (p, q) in enumerate(cases):
            if i == 1:  # the P == Q lane is the only flagged one
                assert flags[i]
            else:
                assert not flags[i]
                assert got[i] == VESTA.add(p, q)


SLOW = __import__("os").environ.get("BZ_RUN_SLOW", "") not in ("", "0")


class TestMsmDevicePaths:
    """Device-kernel MSM paths (the CPU backend runs the same graphs the
    TPU executes; shapes match the cached-compile set). Compile-heavy:
    gated behind BZ_RUN_SLOW=1 like the production-proof tests."""

    @pytest.mark.skipif(not SLOW, reason="set BZ_RUN_SLOW=1 for device MSM graph tests")
    def test_distinct_points_incomplete_path(self):
        rng = random.Random(2)
        pts, acc = [], None
        for _ in range(96):
            acc = VESTA.add(acc, VESTA.generator)
            pts.append(acc)
        sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(96)]
        assert msm(VESTA, pts, sc, force_device=True) == VESTA.pippenger(pts, sc)

    @pytest.mark.skipif(not SLOW, reason="set BZ_RUN_SLOW=1 for device MSM graph tests")
    def test_duplicate_points_trigger_complete_fallback(self):
        rng = random.Random(2)
        base = VESTA.mul(VESTA.generator, 99)
        pts = [base] * 64
        sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(64)]
        assert msm(VESTA, pts, sc, force_device=True) == VESTA.pippenger(pts, sc)


class TestSignedMsm:
    """Signed-digit Pippenger (ops/msm.py): digit recomposition and the
    device path (doubled [P | -P] arrays, magnitude buckets, two-level
    aggregation) vs the exact host MSM."""

    def test_signed_digit_recomposition(self):
        from battlezips_halo2_tpu.ops.msm import scalars_to_signed_digits

        for c in (8, 10, 12, 13, 16):
            rng = random.Random(c)
            xs = [0, 1, VESTA.scalar.modulus - 1] + [
                rng.randrange(VESTA.scalar.modulus) for _ in range(5)
            ]
            d = scalars_to_signed_digits(xs, c)
            half = 1 << (c - 1)
            assert d.max() <= half and d.min() >= -half
            for i, s in enumerate(xs):
                v = sum(int(d[w, i]) << (c * w) for w in range(d.shape[0]))
                assert v == s

    @pytest.mark.skipif(
        not SLOW,
        reason="XLA-CPU compile of the signed Pippenger graph is pathological "
        "(>20 min, ~20 GB RSS — the unrolled limb scan bodies blow up the CPU "
        "backend's optimizer); the graph compiles in ~2 min on the real TPU and "
        "is exercised there by bench.py's correctness gate. BZ_RUN_SLOW=1 runs it.",
    )
    @pytest.mark.parametrize("c", [10, 13])
    def test_signed_device_msm_vs_host(self, c):
        # Runs in a SUBPROCESS: the XLA:CPU backend segfaults the whole
        # interpreter compiling/executing this graph on some hosts (r5:
        # reproduced with a fresh compile cache — a backend crash, not
        # cache poisoning; it killed two full slow-tier runs). A signal
        # death is reported as xfail with the crash signature so the
        # environment bug is visible without killing the suite; a REAL
        # mismatch still fails.
        import subprocess
        import sys
        import textwrap

        script = textwrap.dedent(
            f"""
            import random, sys
            sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).resolve().parent.parent))})
            import jax
            jax.config.update("jax_platforms", "cpu")
            import numpy as np
            import jax.numpy as jnp
            from battlezips_halo2_tpu.curves.host import VESTA
            from battlezips_halo2_tpu.curves.limb import affine_to_jacobian_host, jacobian_to_affine_host
            from battlezips_halo2_tpu.fields.limb import FieldSpec
            from battlezips_halo2_tpu.ops import msm as M

            c = {c}
            rng = random.Random(3)
            n = 64
            pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]
            scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
            scalars[0] = 0
            pts[1] = None
            want = VESTA.msm(pts, scalars)
            spec = FieldSpec.make(VESTA.base.modulus)
            jac = affine_to_jacobian_host(spec, pts)
            qinf = jnp.asarray(np.array([p is None for p in pts], dtype=bool))
            digits = jnp.asarray(M.scalars_to_signed_digits(scalars, c))
            fc = M._compiled_msm(VESTA.base.modulus, n, c, digits.shape[0], complete=True, signed=True)
            wsums, _ = fc(jac.x, jac.y, qinf, digits)
            got = M.host_window_fold(VESTA, jacobian_to_affine_host(spec, wsums), c)
            assert got == want, "complete-law mismatch"
            fi = M._compiled_msm(VESTA.base.modulus, n, c, digits.shape[0], signed=True)
            wsums_i, coll = fi(jac.x, jac.y, qinf, digits)
            if not bool(np.asarray(coll)):
                got_i = M.host_window_fold(VESTA, jacobian_to_affine_host(spec, wsums_i), c)
                assert got_i == want, "incomplete fast-path mismatch"
            print("OK")
            """
        )
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True, timeout=3600
        )
        if proc.returncode < 0:
            pytest.xfail(
                f"XLA:CPU backend died with signal {-proc.returncode} compiling the "
                "signed Pippenger graph (known environment crash; kernel is "
                "validated on the real TPU by bench.py's correctness gate)"
            )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "OK" in proc.stdout


def test_signed_packed_sort_matches_two_array():
    """The single-uint32 packed (mag|sign|idx) sort used when c+1+idx_bits
    <= 32 yields the same per-(window, bucket) row sets and sorted keys as
    the two-array [mag, payload] sort (pure index logic — validates the
    packing without compiling any point-op graph)."""
    import jax
    import jax.numpy as jnp

    from battlezips_halo2_tpu.ops import msm as M

    rng = random.Random(0)
    for n, c in ((256, 10), (1024, 13)):
        sc = [rng.randrange(1 << 255) for _ in range(n)]
        digits = jnp.asarray(M.scalars_to_signed_digits(sc, c))
        idx_bits = max(1, (n - 1).bit_length())
        assert c + 1 + idx_bits <= 32
        mag = jnp.abs(digits.astype(jnp.int32))
        sgn = (digits < 0).astype(jnp.int32)
        key = (
            (mag.astype(jnp.uint32) << (idx_bits + 1))
            | (sgn.astype(jnp.uint32) << idx_bits)
            | jnp.arange(n, dtype=jnp.uint32)
        )
        key_s = jax.lax.sort(key, dimension=1)
        k1 = np.asarray((key_s >> (idx_bits + 1)).astype(jnp.int32))
        o1 = np.asarray(((key_s & ((1 << idx_bits) - 1)) + ((key_s >> idx_bits) & 1) * n))
        payload = (sgn << idx_bits) | jnp.arange(n, dtype=jnp.int32)
        k2, pay_s = jax.lax.sort([mag, payload], dimension=1, num_keys=1)
        o2 = np.asarray((pay_s & ((1 << idx_bits) - 1)) + (pay_s >> idx_bits) * n)
        assert (k1 == np.asarray(k2)).all()
        for w in range(digits.shape[0]):
            by_bucket_1: dict = {}
            by_bucket_2: dict = {}
            for a, b in zip(k1[w], o1[w]):
                by_bucket_1.setdefault(int(a), set()).add(int(b))
            for a, b in zip(np.asarray(k2)[w], o2[w]):
                by_bucket_2.setdefault(int(a), set()).add(int(b))
            assert by_bucket_1 == by_bucket_2


def test_signed_digits_device_matches_host():
    """In-graph signed digit extraction (signed_digits_device) == the host
    scalars_to_signed_digits, over edge scalars (0, 1, p-1) and random ones.
    Pure bit logic — no point-op graphs compiled."""
    import jax.numpy as jnp

    from battlezips_halo2_tpu.fields import limb as L
    from battlezips_halo2_tpu.ops import msm as M

    rng = random.Random(1)
    for c in (10, 13):
        sc = [0, 1, VESTA.scalar.modulus - 1] + [
            rng.randrange(VESTA.scalar.modulus) for _ in range(61)
        ]
        limbs = jnp.asarray(L.ints_to_limbs(sc))
        got = np.asarray(M.signed_digits_device(limbs, c))
        assert (got == M.scalars_to_signed_digits(sc, c)).all()


def test_counting_partition_groups_by_bucket():
    """_counting_partition is a bucket-grouped permutation: same per-(window,
    bucket) row sets as lax.sort on the packed key, buckets ascending —
    the contract _msm_device_wsums relies on (intra-bucket order is free;
    point addition commutes). Pure index logic, no point ops."""
    import jax
    import jax.numpy as jnp

    from battlezips_halo2_tpu.ops import msm as M

    rng = random.Random(1)
    for n, c in ((256, 8), (512, 10), (2048, 13)):
        nbuck = (1 << (c - 1)) + 1
        sc = [rng.randrange(1 << 255) for _ in range(n)]
        digits = jnp.asarray(M.scalars_to_signed_digits(sc, c))
        idx_bits = max(1, (n - 1).bit_length())
        mag = jnp.abs(digits.astype(jnp.int32))
        sgn = (digits < 0).astype(jnp.uint32)
        key = (
            (mag.astype(jnp.uint32) << (idx_bits + 1))
            | (sgn << idx_bits)
            | jnp.arange(n, dtype=jnp.uint32)
        )
        import os

        for hist in ("scatter", "onehot"):
            old = os.environ.get("BZ_MSM_HIST")
            os.environ["BZ_MSM_HIST"] = hist
            try:
                (got,) = jax.jit(lambda k, m: M._counting_partition([k], m, nbuck))(key, mag)
            finally:
                if old is None:
                    os.environ.pop("BZ_MSM_HIST")
                else:
                    os.environ["BZ_MSM_HIST"] = old
            want = jax.lax.sort(key, dimension=1)
            got_np, want_np = np.asarray(got), np.asarray(want)
            for w in range(digits.shape[0]):
                # identical multiset of rows (permutation, nothing dropped)
                assert sorted(got_np[w].tolist()) == sorted(want_np[w].tolist())
                # grouped by bucket id, ascending
                mags = got_np[w] >> (idx_bits + 1)
                assert (np.diff(mags.astype(np.int64)) >= 0).all(), (n, c, hist, w)


def test_counting_partition_multi_array():
    """Multi-array variant (the c+1+idx_bits > 32 path): all arrays permuted
    by the SAME position map."""
    import jax
    import jax.numpy as jnp

    from battlezips_halo2_tpu.ops import msm as M

    rng = random.Random(2)
    n, c = 1024, 12
    nbuck = (1 << (c - 1)) + 1
    sc = [rng.randrange(1 << 255) for _ in range(n)]
    digits = jnp.asarray(M.scalars_to_signed_digits(sc, c))
    mag = jnp.abs(digits.astype(jnp.int32))
    payload = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], mag.shape)
    k_g, p_g = jax.jit(lambda m, p: M._counting_partition([m, p], m, nbuck))(mag, payload)
    k_np, p_np, mag_np = np.asarray(k_g), np.asarray(p_g), np.asarray(mag)
    for w in range(mag.shape[0]):
        assert (np.diff(k_np[w].astype(np.int64)) >= 0).all()
        # payload row i carries the original index; its grouped mag must match
        assert (mag_np[w][p_np[w]] == k_np[w]).all()
        assert sorted(p_np[w].tolist()) == list(range(n))


def test_ntt_arg_twiddles_matches_host():
    """ntt_arg_tw (argument-twiddle butterfly for 2^20+ relay payloads)
    == host NTT, bit for bit."""
    import jax.numpy as jnp

    from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
    from battlezips_halo2_tpu.fields import limb as L
    from battlezips_halo2_tpu.ops import ntt as D
    from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

    n = 64
    dom = EvaluationDomain(6, 2)
    rng = random.Random(9)
    vals = [rng.randrange(FP.modulus) for _ in range(n)]
    plan = D.arg_plan_for(FP.modulus, n, dom.omega)
    a = jnp.asarray(L.to_mont(FP_SPEC, ints_to_limbs(vals)))
    out = D.ntt_arg_tw(
        FP_SPEC, plan.logn, a, jnp.asarray(plan.rev_idx), plan.device_twiddles()
    )
    got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out)))
    assert got == ntt_host(vals, dom.omega)
