"""Extract golden test vectors (public curve constants) from the reference.

Parses the numeric constant tables in the reference's
``src/utils/constants/fixed_bases/board_commit_{v,r}.rs`` — the Pedersen
generator affine coordinates and the fixed-base-multiplication Z/U
canonicity tables — into ``battlezips_halo2_tpu/utils/constants/reference_tables.json``.

These are public cryptographic parameters (outputs of
``hash_to_curve("battlezips:hash2curve")``), used as parity oracles: our own
generator derivation and window-table generation must reproduce them
byte-for-byte (SURVEY.md §7.3 item 2).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/src/utils/constants/fixed_bases")
OUT = Path(__file__).resolve().parent.parent / "battlezips_halo2_tpu/utils/constants/reference_tables.json"

NUM_WINDOWS = 85
H = 8


def parse_table(path: Path) -> dict:
    text = path.read_text()

    def const_block(name: str) -> str:
        m = re.search(rf"pub const {name}[^=]*=(.*?);", text, re.S)
        assert m, f"missing const {name} in {path}"
        return m.group(1)

    gen_nums = [int(x) for x in re.findall(r"\d+", const_block("GENERATOR"))]
    assert len(gen_nums) == 64
    gx = bytes(gen_nums[:32])
    gy = bytes(gen_nums[32:])

    z_block = const_block("Z")
    z_nums = [int(x) for x in re.findall(r"\d+", z_block)]
    assert len(z_nums) == NUM_WINDOWS, len(z_nums)

    u_block = const_block("U")
    u_nums = [int(x) for x in re.findall(r"\d+", u_block)]
    # the type annotation [[[u8; 32]; H]; NUM_WINDOWS] contributes no digits
    # inside the value block (we matched after '='), so expect exactly the data
    assert len(u_nums) == NUM_WINDOWS * H * 32, len(u_nums)
    u = []
    it = iter(u_nums)
    for _ in range(NUM_WINDOWS):
        window = []
        for _ in range(H):
            window.append(bytes(next(it) for _ in range(32)).hex())
        u.append(window)

    return {
        "generator_x": gx.hex(),
        "generator_y": gy.hex(),
        "z": z_nums,
        "u": u,
    }


def main():
    tables = {
        "board_commit_v": parse_table(REF / "board_commit_v.rs"),
        "board_commit_r": parse_table(REF / "board_commit_r.rs"),
        "num_windows": NUM_WINDOWS,
        "h": H,
        "source": "BattleZips-Halo2 src/utils/constants/fixed_bases/{board_commit_v,board_commit_r}.rs",
    }
    OUT.write_text(json.dumps(tables, indent=1))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
