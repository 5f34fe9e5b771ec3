#!/usr/bin/env python
"""Persistent proving server — the serving answer to the first-call cost
(VERDICT r4 next #8).

The reference's wasm layer regenerates params+keys on EVERY call
(src/wasm/circuit_wasm.rs:57-62); this framework persists pk/vk artifacts
and keeps a warm process. Cold-to-first-proof is bounded by the NATIVE
engine (no compilation: the C++ runtime is ready the moment the artifacts
load), while the TPU executables for the batch-amortized path warm in a
BACKGROUND thread and take over transparently for batch requests once
traced.

Protocol: newline-delimited JSON on stdin/stdout (or a TCP port with
--port). Requests:

  {"op": "prove_board", "ships": [[x,y,z]*5], "trapdoor": int?}
  {"op": "prove_shot", "state_hex": str, "trapdoor": int, "shot": [x,y],
   "hit": bool}
  {"op": "prove_session", "games": [[[x,y,z]*5]...], "shots_per_game": N,
   "batched": bool?}
  {"op": "verify_board", "proof_hex": str, "commitment": [x, y]}
  {"op": "status"}   -> uptime, proofs served, per-op latency stats
  {"op": "shutdown"}

Responses: {"ok": true, ...} with "latency_s" per request.

Measured serving numbers (this host, 4-core, native tier):
`python tools/serve.py --bench-cold` forks a FRESH process and reports
cold-to-first-proof wall clock end to end.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class Server:
    def __init__(self, warm_device: bool = False):
        t0 = time.time()
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        from battlezips_halo2_tpu import api

        self.api = api
        # artifact load: SRS + pk/vk from the checkpoint store (built once
        # per machine; keygen runs only on a cold artifact cache)
        api._board_keys()
        api._shot_keys()
        self.ready_s = time.time() - t0
        self.t_start = t0
        self.count = 0
        self.latencies: dict = {}
        if warm_device:
            import threading

            threading.Thread(target=self._warm_device, daemon=True).start()

    def _warm_device(self):
        """Trace/load the batch-amortized device executables off the
        request path; until this finishes, batch requests use the host
        engine (bit-identical bytes either way)."""
        try:
            placements = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
            self.api.prove_session([placements], shots_per_game=1, seed=0,
                                   batched=True, batch_engine="device")
            self.device_ready = True
        except Exception as e:  # no accelerator attached: host tier serves
            self.device_error = str(e)

    def handle(self, req: dict) -> dict:
        from battlezips_halo2_tpu.utils import BinaryValue

        op = req.get("op")
        t0 = time.time()
        if op == "status":
            return {
                "ok": True,
                "uptime_s": round(time.time() - self.t_start, 1),
                "startup_s": round(self.ready_s, 2),
                "proofs_served": self.count,
                "latency_s": {k: round(sum(v) / len(v), 3) for k, v in self.latencies.items()},
            }
        if op == "prove_board":
            ships = [tuple(s) for s in req["ships"]]
            out = self.api.prove_board(ships, trapdoor=req.get("trapdoor"))
            resp = {
                "ok": True,
                "commitment": [out.commitment[0], out.commitment[1]],
                "proof_hex": out.proof.hex(),
            }
            self.count += 1
        elif op == "prove_shot":
            state = BinaryValue(int(req["state_hex"], 16))
            out = self.api.prove_shot(
                state, req["trapdoor"], tuple(req["shot"]), bool(req["hit"])
            )
            resp = {
                "ok": True,
                "commitment": [out.commitment[0], out.commitment[1]],
                "shot": out.shot,
                "hit": out.hit,
                "proof_hex": out.proof.hex(),
            }
            self.count += 1
        elif op == "prove_session":
            games = [[tuple(s) for s in g] for g in req["games"]]
            session = self.api.prove_session(
                games,
                shots_per_game=req.get("shots_per_game", 8),
                batched=req.get("batched", False),
            )
            resp = {
                "ok": True,
                "board_proofs": [p.proof.hex() for p in session.board_proofs],
                "shot_proofs": [p.proof.hex() for p in session.shot_proofs],
            }
            self.count += len(session.board_proofs) + len(session.shot_proofs)
        elif op == "verify_board":
            from battlezips_halo2_tpu.api import BoardProof

            proof = BoardProof(
                commitment=tuple(req["commitment"]), proof=bytes.fromhex(req["proof_hex"])
            )
            resp = {"ok": True, "valid": self.api.verify_board(proof)}
        elif op == "shutdown":
            return {"ok": True, "bye": True}
        else:
            return {"ok": False, "error": f"unknown op {op!r}"}
        dt = time.time() - t0
        resp["latency_s"] = round(dt, 3)
        self.latencies.setdefault(op, []).append(dt)
        return resp


def run_stdio(warm_device: bool):
    srv = Server(warm_device=warm_device)
    print(json.dumps({"ok": True, "ready": True, "startup_s": round(srv.ready_s, 2)}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            resp = srv.handle(json.loads(line))
        except Exception as e:
            resp = {"ok": False, "error": str(e)}
        print(json.dumps(resp), flush=True)
        if resp.get("bye"):
            break


def bench_cold():
    """Fork a FRESH server process; measure cold-to-ready and
    cold-to-first-proof (the number the reference's wasm flow pays per
    call, and the driver's first_call_s analog for the proof path)."""
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stdio"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
        cwd=REPO,
    )
    ready_line = proc.stdout.readline()
    t_ready = time.time() - t0
    reqs = [
        {"op": "prove_shot", "state_hex": hex(sum(1 << i for i in (0, 1, 2, 3, 4)))[2:],
         "trapdoor": 777, "shot": [0, 0], "hit": True},
        {"op": "prove_board", "ships": [[0, 0, 0], [9, 1, 1], [2, 2, 0], [3, 4, 1], [5, 5, 0]]},
        {"op": "status"},
        {"op": "shutdown"},
    ]
    outs = []
    for r in reqs:
        proc.stdin.write(json.dumps(r) + "\n")
        proc.stdin.flush()
        outs.append(json.loads(proc.stdout.readline()))
    t_first = None
    for r, o in zip(reqs, outs):
        if r["op"] == "prove_shot":
            assert o["ok"], o
            t_first = t_ready + o["latency_s"]
    proc.wait(timeout=30)
    print(
        json.dumps(
            {
                "metric": "serving_cold_to_first_proof_s",
                "value": round(t_first, 2),
                "unit": "s",
                "detail": {
                    "cold_to_ready_s": round(t_ready, 2),
                    "ready_line": json.loads(ready_line),
                    "board_latency_s": outs[1].get("latency_s"),
                    "status": outs[2],
                },
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stdio", action="store_true", help="serve on stdin/stdout")
    ap.add_argument("--warm-device", action="store_true",
                    help="background-trace the TPU batch executables")
    ap.add_argument("--bench-cold", action="store_true",
                    help="fork a fresh server and measure cold-to-first-proof")
    args = ap.parse_args()
    if args.bench_cold:
        bench_cold()
    else:
        run_stdio(args.warm_device)


if __name__ == "__main__":
    main()
