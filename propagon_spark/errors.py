"""Typed errors mirroring the reference's error enum.

Reference: ``/root/reference/crates/propagon/src/error.rs:57-59``
(``Error::EmptyDataset``), seed validation errors
(``crates/propagon/src/algos/pagerank.rs:106-131``), numeric divergence
(``crates/propagon/src/algos/katz.rs:87-94``).
"""

from __future__ import annotations


class PropagonError(Exception):
    """Base class for all engine errors."""


class EmptyDatasetError(PropagonError):
    """Raised when an algorithm is fit on a dataset with no rows.

    Mirrors ``Error::EmptyDataset`` (``error.rs:57-59``,
    ``clients/python/tests/test_errors.py:9-10``).
    """


class InvalidParameterError(PropagonError, ValueError):
    """Bad parameter: unknown enum value, bad seed name/weight, etc.

    Mirrors the reference's typed parameter errors
    (``pagerank.rs:106-131``, ``test_errors.py:39``).
    """


class NumericError(PropagonError, ArithmeticError):
    """Numeric divergence / collapse during iteration.

    Mirrors Katz's divergence guard (``katz.rs:87-94``) and HITS's
    collapse error (``hits.rs:165-170``).
    """
