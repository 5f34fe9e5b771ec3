"""Polynomial commitment scheme: IPA over Vesta (SURVEY.md §7.1 item 5)."""

from .ipa import Params, commit, create_open_proof, verify_open_proof

__all__ = ["Params", "commit", "create_open_proof", "verify_open_proof"]
