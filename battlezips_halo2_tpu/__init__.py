"""battlezips_halo2_tpu — a TPU-native Halo2-style zero-knowledge proving framework.

Built from scratch in JAX/XLA/Pallas with the full capabilities of the
BattleZips/BattleZips-Halo2 reference (see SURVEY.md): Pasta-curve field and
curve arithmetic as vectorized limb kernels, Pippenger MSM + radix-2 NTT for
the IPA polynomial commitment scheme, a PLONKish constraint system with
custom gates / permutation / lookup arguments, a MockProver-grade diagnostic
harness, the in-circuit ECC/Pedersen gadget, and the Battleship application
layer (board & shot circuits with malicious-witness fault injection).
"""

__version__ = "0.1.0"
