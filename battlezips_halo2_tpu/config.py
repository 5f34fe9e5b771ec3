"""Framework configuration (SURVEY.md §5.6).

The reference's configuration surface is compile-time only (const generics
+ module constants + a swap-in Cargo manifest); the TPU framework's runtime
knobs live in ONE dataclass, populated from environment variables with the
same ``BZ_*`` names. ``config()`` is the canonical read point — every
subsystem below consults it (ops/msm.py, ops/ntt.py, ops/dispatch.py,
plonk/{prover,verifier,keys}.py, api.py, parallel/context.py); the
circuit-shape constants mirror ``utils/constants.py`` (which mirrors the
reference's src/utils/constants.rs).

Environment flags:

| Flag | Field | Effect |
|---|---|---|
| BZ_TPU_TRACE | trace_prover | per-phase prover span logs |
| BZ_VERIFY_TRACE | trace_verifier | verifier failure-point logs |
| BZ_HOST_QUOTIENT | host_quotient | exact host quotient (cross-check) |
| BZ_PROOF_ENGINE | proof_engine | auto (default) / device / host — native latency engine routing |
| BZ_LATENCY_N_MAX | latency_n_max | auto-routing threshold: host engine when n <= this |
| BZ_FORCE_FUSED_COMMIT | force_fused_commit | fused lagrange-commit path on any backend (CPU bit-identity tests) |
| BZ_NO_SELECTOR_COMPRESS | selector_compression (inverted) | keygen opt-out |
| BZ_PALLAS_MSM / BZ_PALLAS_NTT | pallas_msm / pallas_ntt | legacy row-layout fused kernels (opt-in) |
| BZ_NO_PALLAS_MSM_T | pallas_msm_t (inverted) | fused transposed MSM scan step (default ON on TPU) |
| BZ_PALLAS_NTT_T | pallas_ntt_t | fused transposed NTT butterfly (opt-in) |
| BZ_NTT_MM | ntt_mm | matmul (MXU 4-step) NTT: auto/on/off |
| BZ_MSM_PARTITION | msm_partition | counting partition instead of lax.sort (opt-in; measured SLOWER on TPU: 260 ms vs 15 ms @2^18, BENCH_NOTES.md) |
| BZ_MSM_HIST | msm_hist | partition histogram flavor: scatter / onehot |
| BZ_MSM_EMIT | msm_emit | bucket emit: dense (default) / scatter |
| BZ_MSM_LANES | msm_lanes | serial-scan lane cap |
| BZ_DISPATCH_RETRIES / BZ_DISPATCH_BACKOFF_S | dispatch_retries / dispatch_backoff_s | transient-failure retry policy |
| BZ_SESSION_WORKERS / BZ_SESSION_DP | session_workers / session_dp | api.prove_session pipelining / DP defaults |
| BZ_SESSION_BATCHED | session_batched | route sessions through the batch-amortized prover |
| BZ_BATCH_ENGINE | batch_engine | batch prover commit/quotient executor: auto/device/host |
| BZ_BATCH_CHUNK / BZ_BATCH_QUOTIENT_CHUNK | batch_chunk / batch_quotient_chunk | columns / proofs per batched dispatch |
| BZ_BATCH_TAIL_WORKERS | batch_tail_workers | threads for the per-proof multiopen/IPA tail |
| BZ_MESH_DP / BZ_MESH_TP | mesh.dp / mesh.tp | parallel.context.mesh_from_config shape |
| BZ_NUM_PROCS / BZ_PROC_ID / BZ_COORDINATOR | procs / proc_id / coordinator | jax.distributed wiring |
| BZ_RUN_SLOW | run_slow_tests | production-proof test tier |
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _flag(name: str) -> bool:
    return os.environ.get(name, "") not in ("", "0")


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape for the parallel layer (SURVEY §2.3): axis sizes
    for data-parallel (proof batch) and tensor/sequence-parallel (MSM
    points / NTT coefficients) sharding. ``None`` = all visible devices on
    one 1-D axis. Consumed by parallel.context.mesh_from_config()."""

    dp: int | None = None
    tp: int | None = None
    axis_names: tuple = ("dp", "tp")


@dataclass(frozen=True)
class FrameworkConfig:
    # circuit shapes (reference parity: src/utils/constants.rs, circuits)
    board_k: int = 12
    shot_k: int = 11
    board_size: int = 100
    lookup_bits: int = 10
    fixed_base_windows: int = 85
    fixed_base_window_size: int = 3

    # prover pipeline
    selector_compression: bool = True
    host_quotient: bool = False
    # proof engine routing: "auto" routes sub-threshold proofs through the
    # native host engine (C++ NTT/VM/MSM — relay dispatch latency dwarfs
    # device compute at the reference's k=11/12), "device" forces the TPU
    # pipeline, "host" forces native. Threshold: domain n <= latency_n_max.
    proof_engine: str = "auto"  # "auto" | "device" | "host"
    latency_n_max: int = 1 << 14
    trace_prover: bool = False
    trace_verifier: bool = False
    force_fused_commit: bool = False  # BZ_FORCE_FUSED_COMMIT: fused lagrange-commit on any backend

    # device kernels
    pallas_msm: bool = False
    pallas_ntt: bool = False
    pallas_msm_t: bool = True
    pallas_ntt_t: bool = False
    ntt_mm: str = "auto"  # "auto" | "on" | "off" — matmul (MXU 4-step) NTT
    msm_partition: bool = False
    msm_hist: str = "scatter"
    msm_emit: str = "dense"  # "dense" (scan-output emit + sort compaction) | "scatter"
    msm_lanes: int = 32768

    # dispatch robustness
    dispatch_retries: int = 3
    dispatch_backoff_s: float = 2.0

    # serving / session
    session_workers: int = 1
    session_dp: int | None = None
    session_batched: bool = False  # BZ_SESSION_BATCHED: batch-amortized prover

    # batch-amortized prover (plonk/batch_prover.py)
    batch_engine: str = "auto"  # BZ_BATCH_ENGINE: "auto" | "device" | "host"
    batch_chunk: int = 256  # BZ_BATCH_CHUNK: columns per fused-commit dispatch
    batch_quotient_chunk: int = 16  # BZ_BATCH_QUOTIENT_CHUNK: proofs per quotient dispatch
    batch_tail_workers: int = 1  # BZ_BATCH_TAIL_WORKERS: threads for the multiopen/IPA tail

    # mesh / distributed
    mesh: MeshConfig = field(default_factory=MeshConfig)
    procs: int = 1
    proc_id: int = 0
    coordinator: str = "127.0.0.1:12807"

    # test tiers
    run_slow_tests: bool = False

    @staticmethod
    def from_env() -> "FrameworkConfig":
        return FrameworkConfig(
            selector_compression=not _flag("BZ_NO_SELECTOR_COMPRESS"),
            host_quotient=_flag("BZ_HOST_QUOTIENT"),
            proof_engine=os.environ.get("BZ_PROOF_ENGINE", "auto"),
            latency_n_max=int(os.environ.get("BZ_LATENCY_N_MAX", str(1 << 14))),
            force_fused_commit=_flag("BZ_FORCE_FUSED_COMMIT"),
            trace_prover=_flag("BZ_TPU_TRACE"),
            trace_verifier=_flag("BZ_VERIFY_TRACE"),
            pallas_msm=_flag("BZ_PALLAS_MSM"),
            pallas_ntt=_flag("BZ_PALLAS_NTT"),
            pallas_msm_t=not _flag("BZ_NO_PALLAS_MSM_T"),
            pallas_ntt_t=_flag("BZ_PALLAS_NTT_T"),
            ntt_mm=os.environ.get("BZ_NTT_MM", "auto"),
            msm_partition=_flag("BZ_MSM_PARTITION"),
            msm_hist=os.environ.get("BZ_MSM_HIST", "scatter"),
            msm_emit=os.environ.get("BZ_MSM_EMIT", "dense"),
            msm_lanes=int(os.environ.get("BZ_MSM_LANES", "32768")),
            dispatch_retries=int(os.environ.get("BZ_DISPATCH_RETRIES", "3")),
            dispatch_backoff_s=float(os.environ.get("BZ_DISPATCH_BACKOFF_S", "2.0")),
            session_workers=int(os.environ.get("BZ_SESSION_WORKERS", "1")),
            session_dp=int(os.environ["BZ_SESSION_DP"]) if os.environ.get("BZ_SESSION_DP") else None,
            session_batched=_flag("BZ_SESSION_BATCHED"),
            batch_engine=os.environ.get("BZ_BATCH_ENGINE", "auto"),
            batch_chunk=int(os.environ.get("BZ_BATCH_CHUNK", "256")),
            batch_quotient_chunk=int(os.environ.get("BZ_BATCH_QUOTIENT_CHUNK", "16")),
            batch_tail_workers=int(os.environ.get("BZ_BATCH_TAIL_WORKERS", "1")),
            mesh=MeshConfig(
                dp=int(os.environ["BZ_MESH_DP"]) if "BZ_MESH_DP" in os.environ else None,
                tp=int(os.environ["BZ_MESH_TP"]) if "BZ_MESH_TP" in os.environ else None,
            ),
            procs=int(os.environ.get("BZ_NUM_PROCS", "1")),
            proc_id=int(os.environ.get("BZ_PROC_ID", "0")),
            coordinator=os.environ.get("BZ_COORDINATOR", "127.0.0.1:12807"),
            run_slow_tests=_flag("BZ_RUN_SLOW"),
        )


def config() -> FrameworkConfig:
    """Current configuration (re-read from the environment each call — the
    subsystems cache what they must; tests monkeypatch env vars)."""
    return FrameworkConfig.from_env()
