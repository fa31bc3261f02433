"""Error model for the Spark-native wrangle engine.

Parity target: the reference wraps any failure inside a transformation
into a ``TransformationException`` carrying a ``Model.field: OpName``
context path (reference ``wrangle_pypes/pipeline.py:119-148``).  In a
distributed engine most failures surface either at *compile* time (spec
doesn't resolve against the input schema -- Spark analysis) or at *run*
time inside the JVM (ANSI cast/element_at errors).  We attach the
``Model.field: Op`` path at compile time, which is where the vast
majority of reference-visible errors (missing keys, bad spec) move to
under a schema-checked engine.
"""

from __future__ import annotations


class WrangleError(Exception):
    """Base class for all engine errors."""


class TransformationError(WrangleError):
    """A transformation could not be compiled against the input schema.

    Carries the ``Model.field: OpName`` context path like the reference's
    ``TransformationException`` re-raise (``pipeline.py:128-135``).
    """

    def __init__(self, message: str, *, model: str | None = None,
                 field: str | None = None, op: str | None = None):
        self.model = model
        self.field = field
        self.op = op
        prefix = ""
        if model or field or op:
            loc = f"{model or '?'}.{field or '?'}"
            prefix = f"failed @ {loc}: {op or '?'}: "
        super().__init__(prefix + message)


class SpecError(WrangleError):
    """The pipeline spec itself is malformed (unknown model, cycle, ...)."""
