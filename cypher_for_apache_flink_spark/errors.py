"""Shared user-facing error hierarchy.

The TCK (and the reference's tck-api runner) asserts the KIND of error a
bad query raises — SyntaxError at compile time, ArithmeticError at
runtime, ... — so user-facing failures must carry a typed class, not a
bare ValueError/KeyError.  Parser and planner re-export these names for
their existing import paths.
"""

from __future__ import annotations


class CypherError(Exception):
    """Base for every user-facing query error this engine raises.

    ``code`` is the machine-readable TCK detail code (the last token of a
    TCK error step, e.g. ``VariableAlreadyBound``, ``NestedAggregation``)
    — the reference surfaces these through the neo4j front end's status
    codes; here raise sites set them directly and the TCK runner asserts
    them when a scenario specifies one.
    """

    def __init__(self, message: str = "", code: str | None = None):
        super().__init__(message)
        self.code = code


class CypherSyntaxError(CypherError):
    """Query text does not lex/parse (TCK: SyntaxError at compile time)."""

    def __init__(self, message: str = "", code: str | None = "InvalidSyntax"):
        super().__init__(message, code=code)


class PlanError(CypherError):
    """Query parsed but cannot be planned: undefined variables, nested
    aggregation, invalid patterns... (the TCK files these under
    SyntaxError/SemanticError, always at compile time)."""


class EntityNotFoundError(CypherError):
    """Accessing the labels or properties of an entity the statement has
    already deleted (TCK: EntityNotFound / DeletedEntityAccess).  Mutation
    executes within the statement, so this is a runtime-phase error even
    though the engine detects it while planning the later clause."""

    phase = "runtime"

    def __init__(self, message: str = "",
                 code: str | None = "DeletedEntityAccess"):
        super().__init__(message, code=code)
