"""Pinned-vk text and transcript digest (plonk/pinned.py).

The vk digest follows halo2 0.2.0's ``VerifyingKey::hash_into``: blake2b-512
(person "Halo2-Verify-Key") over the length-prefixed Rust ``{:?}`` text of
the pinned verifying key (PARITY.md row 9; consumed by the reference at
src/circuits/board.rs:909-912). These tests pin:

1. the Rust derived-Debug formatting rules, against a fully HAND-WRITTEN
   expected string for a stub vk (every convention exercised: struct/tuple/
   list/Option/str/field-element/point rendering, query indexing);
2. the hash construction (length prefix, personalization, wide reduction);
3. the complete frozen text for a real keygen'd circuit
   (tests/golden/pinned_mul_k3.txt) so any drift in gates, query schedule,
   selector compression or commitments shows up as a byte diff.
"""

import hashlib
from types import SimpleNamespace

from battlezips_halo2_tpu.fields.host import FP
from battlezips_halo2_tpu.plonk.circuit import ConstraintSystem
from battlezips_halo2_tpu.plonk.expression import (
    CellQuery,
    Column,
    ColumnType,
    Negated,
    Product,
    Sum,
)
from battlezips_halo2_tpu.plonk.pinned import pinned_vk_text, vk_transcript_repr

P_HEX = "40000000000000000000000000000000224698fc094cf91b992d30ed00000001"
Q_HEX = "40000000000000000000000000000000224698fc0994a8dd8c46eb2100000001"


def _stub_vk():
    cs = ConstraintSystem()
    f0 = cs.fixed_column()
    a0 = cs.advice_column()
    a1 = cs.advice_column()
    i0 = cs.instance_column()
    cs.enable_constant(f0)
    cs.enable_equality(a0)
    cs.enable_equality(i0)
    # f0 * (a0 - a1[next]) — exercises Product/Sum/Negated/rotations
    poly = Product(
        CellQuery(f0, 0), Sum(CellQuery(a0, 0), Negated(CellQuery(a1, 1)))
    )
    cs.create_gate("g", [("c", poly)])
    cs.num_selector_columns = 0  # post-compression accounting (no selectors)
    cs.selector_assignments = {}
    domain = SimpleNamespace(extended_n=32, omega=5)
    return SimpleNamespace(
        k=3,
        cs=cs,
        domain=domain,
        fixed_commitments=[(1, 2)],
        permutation=SimpleNamespace(sigma_commitments=[(3, 4), None]),
    )


def _z(v):  # 64-hex-char zero-padded field element
    return f"0x{v:064x}"


EXPECTED_STUB_TEXT = (
    "PinnedVerificationKey { "
    f'base_modulus: "0x{Q_HEX}", '
    f'scalar_modulus: "0x{P_HEX}", '
    "domain: PinnedEvaluationDomain { k: 3, extended_k: 5, omega: "
    + _z(5)
    + " }, "
    "cs: PinnedConstraintSystem { "
    "num_fixed_columns: 1, num_advice_columns: 2, num_instance_columns: 1, "
    "num_selectors: 0, "
    "gates: [Product(Fixed { query_index: 0, column_index: 0, rotation: Rotation(0) }, "
    "Sum(Advice { query_index: 0, column_index: 0, rotation: Rotation(0) }, "
    "Negated(Advice { query_index: 1, column_index: 1, rotation: Rotation(1) })))], "
    "advice_queries: [(Column { index: 0, column_type: Advice }, Rotation(0)), "
    "(Column { index: 1, column_type: Advice }, Rotation(1))], "
    "instance_queries: [(Column { index: 0, column_type: Instance }, Rotation(0))], "
    "fixed_queries: [(Column { index: 0, column_type: Fixed }, Rotation(0))], "
    "permutation: Argument { columns: [Column { index: 0, column_type: Fixed }, "
    "Column { index: 0, column_type: Advice }, "
    "Column { index: 0, column_type: Instance }] }, "
    "lookups: [], "
    "constants: [Column { index: 0, column_type: Fixed }], "
    "minimum_degree: None }, "
    f"fixed_commitments: [({_z(1)}, {_z(2)})], "
    "permutation: VerifyingKey { commitments: ["
    f"({_z(3)}, {_z(4)}), ({_z(0)}, {_z(0)})] }} }}"
)


def test_pinned_text_hand_vector():
    assert pinned_vk_text(_stub_vk()) == EXPECTED_STUB_TEXT


def test_digest_construction():
    """Digest = blake2b-512(person="Halo2-Verify-Key",
    u64_le(len) || text) wide-reduced into Fp."""
    vk = _stub_vk()
    s = pinned_vk_text(vk).encode()
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(s).to_bytes(8, "little"))
    h.update(s)
    assert vk_transcript_repr(vk) == FP.from_bytes_wide(h.digest())


def test_keygen_digest_uses_pinned(tmp_path):
    """A real keygen'd vk carries the pinned digest, and the full pinned
    text matches the frozen golden (tests/golden/pinned_mul_k3.txt)."""
    from pathlib import Path

    from battlezips_halo2_tpu.pcs.ipa import Params
    from battlezips_halo2_tpu.plonk import keygen
    from tests.test_prover import MulCircuit

    params = Params.new(3)
    pk = keygen(params, MulCircuit(2, 3, 6))
    text = pinned_vk_text(pk.vk)
    assert pk.vk.digest == vk_transcript_repr(pk.vk)
    golden = Path(__file__).parent / "golden" / "pinned_mul_k3.txt"
    assert text == golden.read_text(), (
        "pinned vk text drifted — if intentional, regenerate with "
        "tools/make_golden.py (which rewrites pinned_mul_k3.txt and the "
        "proof-byte vectors together)"
    )
