"""PLONKish proving system: constraint system, synthesis runtime, keygen,
prover, verifier (SURVEY.md §7.1 item 6)."""

from .assignment import AssignedCell, Assignment, Layouter, Region, Table
from .circuit import ConstraintSystem, Gate, Lookup, TableColumn
from .expression import Column, ColumnType, Constant, Expression, Selector


class Circuit:
    """Base circuit protocol (halo2 ``Circuit`` trait analog).

    Subclasses implement:
    * ``configure(cls, cs) -> Config`` (classmethod/staticmethod)
    * ``synthesize(self, config, layouter)``
    * ``without_witnesses(self) -> Circuit`` — same shape, dummy witness
      (used by keygen; reference analog src/circuits/board.rs:26-28).
    """

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        raise NotImplementedError

    def synthesize(self, config, layouter: Layouter):
        raise NotImplementedError

    def without_witnesses(self) -> "Circuit":
        raise NotImplementedError


def _keygen(params, circuit):
    import sys

    return sys.modules[__name__ + ".keygen"].keygen(params, circuit)


def create_proof(params, pk, circuit, instances, rng):
    from .prover import create_proof as _create

    return _create(params, pk, circuit, instances, rng)


def verify_proof(params, vk, proof, instances):
    from .verifier import verify_proof as _verify

    return _verify(params, vk, proof, instances)


# Loading the `.keygen` SUBMODULE sets the package attribute ``keygen`` to
# the module object, which would silently shadow a same-named function for
# any later `from battlezips_halo2_tpu.plonk import keygen` (the binding
# depended on whether a proof had run first). Import the submodule eagerly,
# then pin the function binding — order-independent from here on.
from . import keygen as _keygen_module  # noqa: E402

keygen = _keygen


__all__ = [
    "keygen",
    "create_proof",
    "verify_proof",
    "AssignedCell",
    "Assignment",
    "Circuit",
    "Column",
    "ColumnType",
    "Constant",
    "ConstraintSystem",
    "Expression",
    "Gate",
    "Layouter",
    "Lookup",
    "Region",
    "Selector",
    "Table",
    "TableColumn",
]
