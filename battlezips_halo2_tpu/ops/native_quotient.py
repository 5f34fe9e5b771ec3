"""Host-native quotient evaluation — the latency-tier twin of the device
VM (ops/gate_eval.py).

At the reference's production circuit sizes (k=11 shot / k=12 board,
halo2 ``create_proof`` at /root/reference/src/circuits/board.rs:913-921 and
benches/{board,shot}.rs) the quotient's arithmetic is ~10-30M field muls —
microseconds-per-element work that a single relay round trip to the TPU
outweighs by two orders of magnitude. The adaptive proof engine
(config.proof_engine, plonk/prover.py) therefore routes sub-threshold
proofs through this evaluator: the SAME bytecode emitted by
``gate_eval.emit_vm`` executed by the native C++ row-blocked VM
(csrc/pasta.cpp pasta_vm_exec), with the coset extension and the final
iNTT on the native batch NTT. Device and native quotients are
bit-identical by construction (identical instruction stream, exact field
ops) — pinned by tests/test_native_engine.py and the golden proof-byte
vectors (tests/test_golden.py).
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..fields.host import FP
from ..plonk.arguments import ProofSchedule
from .gate_eval import emit_vm, quotient_constants, quotient_poly_keys

P = FP.modulus


class NativeQuotientEvaluator:
    """Built once per proving key; __call__(polys_by_key, challenges) ->
    h coefficient list. Same contract as gate_eval.QuotientEvaluator."""

    def __init__(self, vk, schedule: ProofSchedule):
        assert native.available(), "native runtime required for the host quotient VM"
        cs = vk.cs
        domain = vk.domain
        self.domain = domain
        self.keys = quotient_poly_keys(cs, schedule.num_perm_chunks)
        self.key_index = {k: i for i, k in enumerate(self.keys)}
        self.which = native.which_for(P)
        ext = domain.extended_n
        self.rot_scale = ext // domain.n

        self.prog, self.pin_keys, self.n_regs = emit_vm(vk, schedule)
        self.vm_size = (len(self.prog), self.n_regs)

        consts = quotient_constants(vk)

        def as_bytes(vals):
            pre = getattr(vals, "bytes_arr", None)  # PolyInts side channel
            return pre if pre is not None else native.ints_to_bytes_arr(vals)

        self.named = {
            name: as_bytes(consts[name]) for name in ("l0", "llast", "lactive", "x")
        }
        self.named["one"] = np.broadcast_to(
            np.frombuffer((1).to_bytes(32, "little"), dtype=np.uint8), (ext, 32)
        )
        self.t_inv = as_bytes(consts["t_inv"])

    def __call__(self, coeff_polys_by_key: dict, challenges: tuple) -> list[int]:
        domain = self.domain
        ext = domain.extended_n
        which = self.which

        # --- coset extension: scale by g^j, then size-ext NTT --------------
        batch = np.zeros((len(self.keys), ext, 32), dtype=np.uint8)
        for i, key in enumerate(self.keys):
            poly = coeff_polys_by_key[key]
            pre = getattr(poly, "bytes_arr", None)  # PolyInts side channel
            if pre is not None:
                batch[i, : pre.shape[0]] = pre
            else:
                batch[i, : len(poly)] = native.ints_to_bytes_arr(poly)
        native.scale_batch(which, batch, domain.g_coset, 1)
        native.ntt_batch(which, batch, domain.extended_omega)

        # --- bind the pinned registers -------------------------------------
        chal = dict(zip(("theta", "beta", "gamma", "y"), challenges))
        regs = np.zeros((self.n_regs, ext, 32), dtype=np.uint8)
        for pi, key in enumerate(self.pin_keys):
            if key[0] == "inp":
                _, kind, index, rot = key
                arr = batch[self.key_index[(kind, index)]]
                regs[1 + pi] = np.roll(arr, -rot * self.rot_scale, axis=0) if rot else arr
            elif key[0] == "const":
                regs[1 + pi] = np.frombuffer(
                    (key[1] % P).to_bytes(32, "little"), dtype=np.uint8
                )
            elif key[0] == "chal":
                regs[1 + pi] = np.frombuffer(
                    (chal[key[1]] % P).to_bytes(32, "little"), dtype=np.uint8
                )
            else:  # named
                regs[1 + pi] = self.named[key[1]]

        agg = native.vm_exec(which, self.prog, regs)
        h_ext = native.mul_vec(which, agg, self.t_inv)

        # --- extended iNTT + coset unscale ---------------------------------
        hb = np.ascontiguousarray(h_ext.reshape(1, ext, 32))
        native.ntt_batch(which, hb, pow(domain.extended_omega, -1, P))
        native.scale_batch(which, hb, domain.g_coset_inv, pow(ext, -1, P))
        return native.bytes_arr_to_ints(hb.reshape(ext, 32))
