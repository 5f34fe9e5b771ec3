"""Public proving API — the framework's serving surface.

Semantic mirror of the reference's WASM bindings
(src/wasm/circuit_wasm.rs:34-195): ``prove_board`` / ``verify_board`` /
``prove_shot`` / ``verify_shot`` over plain Python data. Unlike the
reference (which regenerates params+keys on every call,
circuit_wasm.rs:57-62), keys are cached per (circuit, k) — the
checkpoint/artifact store the reference lacks (SURVEY.md §5.4).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from functools import lru_cache

from .circuits import BoardCircuit, ShotCircuit
from .fields.host import FQ
from .pcs.ipa import cached_params
from .plonk import create_proof, create_proofs_batched, keygen, verify_proof
from .utils import BinaryValue, Board, Deck, serialize


@dataclass
class BoardProof:
    """Mirror of the BattleZipsWASM export struct (circuit_wasm.rs:27-31)."""

    commitment: tuple  # (x, y) ints
    proof: bytes


def _artifact_dir():
    from pathlib import Path

    return Path(__file__).resolve().parent.parent / ".artifacts"


def _cached_pk(name: str, params, make_circuit):
    """pk/vk artifact store keyed by (circuit, k) — the persistence layer
    the reference's wasm API lacks (circuit_wasm.rs regenerates keys every
    call; SURVEY.md §5.4)."""
    from .plonk.keys import ProvingKey

    # schema v3: selector compression with degree-true lookup budgets
    # changed the pk layout — versioned filename invalidates stale artifacts
    # v4: vk digest switched to the halo2 hash_into pinned-vk construction
    # v5: first-use query numbering (halo2 order) changed the eval schedule
    path = _artifact_dir() / f"pk_h2c_{name}_{params.k}_v5.pkl"
    if path.exists():
        try:
            return ProvingKey.load(path)
        except Exception:
            pass
    pk = keygen(params, make_circuit())
    try:
        pk.save(path)
    except Exception:
        pass
    return pk


@lru_cache(maxsize=2)
def _board_keys():
    params = cached_params(BoardCircuit.K)
    pk = _cached_pk(
        "board",
        params,
        lambda: BoardCircuit([BinaryValue(1)] + [BinaryValue.empty()] * 9, BinaryValue(1), 1),
    )
    return params, pk


@lru_cache(maxsize=2)
def _shot_keys():
    params = cached_params(ShotCircuit.K)
    pk = _cached_pk("shot", params, lambda: ShotCircuit(BinaryValue(1), 1, BinaryValue(1), BinaryValue(1)))
    return params, pk


def _rng():
    class _SecretsRng:
        def randrange(self, n):
            return secrets.randbelow(n)

    return _SecretsRng()


def prove_board(ships: list, trapdoor: int | None = None, rng=None) -> BoardProof:
    """ships: 5 optional (x, y, z) tuples (circuit_wasm.rs:34-85). ``rng``
    (blinding randomness) defaults to a secrets-backed source; inject a
    seeded rng for bit-reproducible proofs (determinism tests)."""
    from .utils.pedersen import pedersen_commit

    board = Board.from_deck(Deck.from_placements(ships))
    if trapdoor is None:
        trapdoor = FQ.random()
    state = board.state()
    commitment = pedersen_commit(state.to_fp(), trapdoor)
    params, pk = _board_keys()
    circuit = BoardCircuit(board.witness(), state, trapdoor)
    proof = create_proof(params, pk, circuit, [[commitment[0], commitment[1]]], rng or _rng())
    return BoardProof(commitment=commitment, proof=proof)


def verify_board(proof: BoardProof) -> bool:
    """Rebuilds vk from cached keys (circuit_wasm.rs:88-112)."""
    params, pk = _board_keys()
    return verify_proof(params, pk.vk, proof.proof, [[proof.commitment[0], proof.commitment[1]]])


@dataclass
class ShotProof:
    commitment: tuple  # board commitment (x, y)
    shot: int  # serialized shot bitfield
    hit: int  # 0/1
    proof: bytes


def prove_shot(
    board_state: BinaryValue, trapdoor: int, shot_xy: tuple, hit: bool, rng=None
) -> ShotProof:
    """Prove a hit/miss assertion against a committed board
    (circuit_wasm.rs:115-169)."""
    shot = serialize([shot_xy[0]], [shot_xy[1]])
    circuit = ShotCircuit(board_state, trapdoor, shot, BinaryValue(1 if hit else 0))
    params, pk = _shot_keys()
    instance = circuit.public_instance()
    proof = create_proof(params, pk, circuit, [instance], rng or _rng())
    return ShotProof(
        commitment=(instance[0], instance[1]), shot=instance[2], hit=instance[3], proof=proof
    )


def verify_shot(proof: ShotProof) -> bool:
    params, pk = _shot_keys()
    instance = [proof.commitment[0], proof.commitment[1], proof.shot, proof.hit]
    return verify_proof(params, pk.vk, proof.proof, [instance])


@dataclass
class GameSession:
    """A batched proving session (BASELINE.md config 5: 64 shot + 8 board
    proofs). Data-parallel across a game batch: each (board, shots) pair is
    independent, so shards of the batch can be proven on different
    hosts/processes; within a host the device work (NTT batches, MSMs)
    is shared-kernel and cache-hot."""

    board_proofs: list
    shot_proofs: list


def prove_session(
    games: list,
    shots_per_game: int = 8,
    trapdoors: list | None = None,
    workers: int | None = None,
    dp_devices: list | int | None = None,
    seed: int | None = None,
    batched: bool | None = None,
    batch_engine: str | None = None,
) -> GameSession:
    """games: list of 5-ship placement lists. Produces one board proof per
    game plus `shots_per_game` shot proofs against each committed board.

    Parallel axes (SURVEY §2.3):
    * ``batched`` routes the session through the BATCH-AMORTIZED prover
      (plonk/batch_prover.py): all board proofs advance phase-synchronously
      as one batch, then all shot proofs — one device dispatch per
      Fiat-Shamir phase per batch instead of per proof. Proof bytes are
      bit-identical to the sequential path for the same ``seed``
      (tests/test_batch_prover.py). Default from BZ_SESSION_BATCHED.
      ``batch_engine``: see create_proofs_batched (device/host/auto).
    * ``workers > 1`` pipelines the independent proofs across a thread pool
      (the proof-batch PP axis): device dispatches release the GIL, so one
      proof's host phases overlap another's device phases. Default 1
      (BZ_SESSION_WORKERS env overrides). With ``batched``, workers>1
      instead splits the shot batch into PP SUB-BATCHES advanced
      concurrently — one sub-batch's host tail overlaps another's device
      phases; proof bytes are unchanged either way.
    * ``dp_devices`` enables DATA-parallel proving: each worker's device
      work is pinned round-robin onto one of the given jax devices (an int
      selects the first N local devices; BZ_SESSION_DP env overrides). DP
      proofs are bit-identical to sequential ones for the same seed
      (tests/test_parallel.py).
    * ``seed`` derives a per-job blinding rng (deterministic sessions);
      None keeps secrets-backed blinding.
    """
    import random as _random

    import jax as _jax

    from .config import config as _config

    if batched is None:
        batched = _config().session_batched
    if workers is None:
        workers = _config().session_workers
    if dp_devices is None and _config().session_dp:
        dp_devices = _config().session_dp
    if isinstance(dp_devices, int):
        dp_devices = _jax.devices()[:dp_devices]
    if dp_devices:
        workers = max(workers, len(dp_devices))

    def job_rng(idx: int):
        return _random.Random(f"bz-session:{seed}:{idx}") if seed is not None else _rng()

    board_jobs = []  # (ships, trapdoor)
    shot_jobs = []  # (state, trapdoor, xy, hit)
    for gi, ships in enumerate(games):
        trapdoor = trapdoors[gi] if trapdoors else FQ.random()
        board_jobs.append((ships, trapdoor))
        state = Board.from_deck(Deck.from_placements(ships)).state()
        for si in range(shots_per_game):
            x, y = si % 10, (si * 3 + gi) % 10
            shot_jobs.append((state, trapdoor, (x, y), bool(state.bit(y * 10 + x))))

    # warm the key caches serially (keygen is not a pipeline stage)
    if board_jobs:
        _board_keys()
    if shot_jobs:
        _shot_keys()

    if batched:
        from .utils.pedersen import pedersen_commit

        board_proofs = []
        if board_jobs:
            params, pk = _board_keys()
            circuits, instances, rngs_b, commitments = [], [], [], []
            for idx, (ships, t) in enumerate(board_jobs):
                board = Board.from_deck(Deck.from_placements(ships))
                state = board.state()
                commitment = pedersen_commit(state.to_fp(), t)
                circuits.append(BoardCircuit(board.witness(), state, t))
                instances.append([[commitment[0], commitment[1]]])
                rngs_b.append(job_rng(idx))
                commitments.append(commitment)
            proofs = create_proofs_batched(
                params, pk, circuits, instances, rngs_b, engine=batch_engine
            )
            board_proofs = [
                BoardProof(commitment=c, proof=p) for c, p in zip(commitments, proofs)
            ]
        shot_proofs = []
        if shot_jobs:
            params, pk = _shot_keys()
            circuits, instances, rngs_s = [], [], []
            for idx, (state, t, xy, hit) in enumerate(shot_jobs):
                shot = serialize([xy[0]], [xy[1]])
                circuit = ShotCircuit(state, t, shot, BinaryValue(1 if hit else 0))
                circuits.append(circuit)
                instances.append([circuit.public_instance()])
                rngs_s.append(job_rng(1_000_000 + idx))
            if workers > 1 and len(circuits) >= 2 * workers:
                # PP across sub-batches: each worker advances its sub-batch
                # through the Fiat-Shamir phases independently, so one
                # sub-batch's host tail (evals/multiopen/IPA) overlaps
                # another's device dispatches. Per-proof bytes are
                # unaffected (each proof's transcript/rng is its own).
                from concurrent.futures import ThreadPoolExecutor

                step = (len(circuits) + workers - 1) // workers
                spans = [(i, min(i + step, len(circuits))) for i in range(0, len(circuits), step)]
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    futs = [
                        pool.submit(
                            create_proofs_batched,
                            params, pk,
                            circuits[a:b], instances[a:b], rngs_s[a:b],
                            engine=batch_engine,
                        )
                        for a, b in spans
                    ]
                    proofs = [p for f in futs for p in f.result()]
            else:
                proofs = create_proofs_batched(
                    params, pk, circuits, instances, rngs_s, engine=batch_engine
                )
            for circuit, inst, p in zip(circuits, instances, proofs):
                inst = inst[0]
                shot_proofs.append(
                    ShotProof(
                        commitment=(inst[0], inst[1]), shot=inst[2], hit=inst[3], proof=p
                    )
                )
        return GameSession(board_proofs, shot_proofs)

    def run_board(idx, job):
        ships, t = job
        if dp_devices:
            with _jax.default_device(dp_devices[idx % len(dp_devices)]):
                return prove_board(ships, t, rng=job_rng(idx))
        return prove_board(ships, t, rng=job_rng(idx))

    def run_shot(idx, job):
        if dp_devices:
            with _jax.default_device(dp_devices[idx % len(dp_devices)]):
                return prove_shot(*job, rng=job_rng(1_000_000 + idx))
        return prove_shot(*job, rng=job_rng(1_000_000 + idx))

    if workers <= 1:
        board_proofs = [run_board(i, j) for i, j in enumerate(board_jobs)]
        shot_proofs = [run_shot(i, j) for i, j in enumerate(shot_jobs)]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            bf = [pool.submit(run_board, i, j) for i, j in enumerate(board_jobs)]
            sf = [pool.submit(run_shot, i, j) for i, j in enumerate(shot_jobs)]
            board_proofs = [f.result() for f in bf]
            shot_proofs = [f.result() for f in sf]
    return GameSession(board_proofs, shot_proofs)


def verify_session(session: GameSession) -> bool:
    return all(verify_board(p) for p in session.board_proofs) and all(
        verify_shot(p) for p in session.shot_proofs
    )
