"""Shared user-facing error hierarchy.

The TCK (and the reference's tck-api runner) asserts the KIND of error a
bad query raises — SyntaxError at compile time, ArithmeticError at
runtime, ... — so user-facing failures must carry a typed class, not a
bare ValueError/KeyError.  Parser and planner re-export these names for
their existing import paths.
"""

from __future__ import annotations


class CypherError(Exception):
    """Base for every user-facing query error this engine raises."""


class CypherSyntaxError(CypherError):
    """Query text does not lex/parse (TCK: SyntaxError at compile time)."""


class PlanError(CypherError):
    """Query parsed but cannot be planned: undefined variables, nested
    aggregation, invalid patterns... (the TCK files these under
    SyntaxError/SemanticError, always at compile time)."""
