"""Adaptive proof-engine routing (config.proof_engine).

The framework has two executors for the prover's polynomial work:

* the **device engine** — batched TPU kernels (ops/ntt.py, ops/msm.py,
  ops/gate_eval.py), the throughput path: owns every super-threshold
  problem and all standalone MSM/NTT benchmarks;
* the **native host engine** — C++ NTT / bytecode VM / Pippenger
  (csrc/pasta.cpp), the latency path: at the reference's production sizes
  (k=11/12 → n ≤ 4096; src/circuits/{board,shot}.rs) every prover phase is
  well under a millisecond of compute, while one device dispatch through
  the relay costs ~1.5 s for MB-scale executables (BENCH_NOTES.md round-4
  anatomy) — a ~10-phase Fiat-Shamir pipeline is dispatch-bound at ~29 s.

``auto`` (default) picks the host engine when the domain size is at or
below ``latency_n_max`` AND the native library is available; ``device`` /
``host`` force a side. Both engines execute identical exact field
arithmetic — proofs are bit-identical (tests/test_native_engine.py,
tests/test_golden.py run the same golden vectors through either).
"""

from __future__ import annotations

from ..config import config


def use_host_engine(n: int) -> bool:
    """True if work on a size-n domain should route to the native host
    engine (latency tier)."""
    cfg = config()
    if cfg.proof_engine == "device":
        return False
    from .. import native

    if not native.available():
        return False
    if cfg.proof_engine == "host":
        return True
    return n <= cfg.latency_n_max
