"""S2Error taxonomy (API parity with /root/reference/src/error.rs:13-137).

A Python exception hierarchy mirroring the reference's error enum: one
class per variant, identical message formats (the #[error(...)]
attribute strings), plus the constructor helpers (error.rs:147-210).
All inherit from :class:`S2Error` (itself a ValueError so existing
callers catching ValueError keep working).
"""

from __future__ import annotations

MAX_LEVEL = 30


class S2Error(ValueError):
    """Base of the reference error taxonomy (error.rs:13)."""


class InvalidPointError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Invalid point: {reason}")


class InvalidLatitudeError(S2Error):
    def __init__(self, value: float):
        self.value = value
        super().__init__(
            f"Invalid latitude: {value} (must be in [-π/2, π/2])"
        )


class InvalidLongitudeError(S2Error):
    def __init__(self, value: float):
        self.value = value
        super().__init__(
            f"Invalid longitude: {value} (must be in [-π, π])"
        )


class InvalidAngleError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Invalid angle: {reason}")


class InvalidCellIdError(S2Error):
    def __init__(self, cell_id: int, reason: str):
        self.cell_id = cell_id
        self.reason = reason
        # {cell_id:#018x} in Rust == 0x-prefixed, zero-padded to 16 hex
        super().__init__(
            f"Invalid S2CellId: {cell_id & (2**64 - 1):#018x} - {reason}"
        )


class InvalidCellLevelError(S2Error):
    def __init__(self, level: int, max_level: int = MAX_LEVEL):
        self.level = level
        self.max_level = max_level
        super().__init__(
            f"Invalid cell level: {level} (must be in [0, {max_level}])"
        )


class InvalidFaceError(S2Error):
    def __init__(self, face: int):
        self.face = face
        super().__init__(f"Invalid face: {face} (must be in [0, 5])")


class InvalidLoopError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Invalid loop: {reason}")


class InvalidPolygonError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Invalid polygon: {reason}")


class InvalidPolylineError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Invalid polyline: {reason}")


class InsufficientPrecisionError(S2Error):
    def __init__(self, operation: str):
        self.operation = operation
        super().__init__(
            f"Computation failed: insufficient precision for {operation}"
        )


class GeometricDegeneracyError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Geometric degeneracy: {reason}")


class IndexError_(S2Error):
    """IndexError variant (named with a trailing underscore to avoid
    shadowing the Python builtin)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Index construction failed: {reason}")


class QueryError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Query failed: {reason}")


class BooleanOperationError(S2Error):
    def __init__(self, operation: str, reason: str):
        self.operation = operation
        self.reason = reason
        super().__init__(
            f"Boolean operation failed: {operation} - {reason}"
        )


class BuilderError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"Builder operation failed: {reason}")


class InternalError(S2Error):
    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(
            f"Internal error: {reason} - please report this bug"
        )


# constructor helpers (error.rs:147-210)
def invalid_point(reason: str) -> InvalidPointError:
    return InvalidPointError(reason)


def invalid_latitude(value: float) -> InvalidLatitudeError:
    return InvalidLatitudeError(value)


def invalid_longitude(value: float) -> InvalidLongitudeError:
    return InvalidLongitudeError(value)


def invalid_cell_id(cell_id: int, reason: str) -> InvalidCellIdError:
    return InvalidCellIdError(cell_id, reason)


def invalid_cell_level(level: int,
                       max_level: int = MAX_LEVEL) -> InvalidCellLevelError:
    return InvalidCellLevelError(level, max_level)


def invalid_face(face: int) -> InvalidFaceError:
    return InvalidFaceError(face)


def insufficient_precision(operation: str) -> InsufficientPrecisionError:
    return InsufficientPrecisionError(operation)


def geometric_degeneracy(reason: str) -> GeometricDegeneracyError:
    return GeometricDegeneracyError(reason)


def internal_error(reason: str) -> InternalError:
    return InternalError(reason)


def invalid_loop(reason: str) -> InvalidLoopError:
    return InvalidLoopError(reason)
