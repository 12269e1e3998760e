"""Command/config validator rule table (SURVEY §2.3 F6, §2.10 U3).

The reference validates control-command parameters in a dedicated module so
the rules are testable in isolation (``cupertino_nvr/processor/
validators.py:49-180``) and validates engine config on construction
(``processor/config.py:99-150``). Both tables are reproduced here twice,
deliberately:

- **Python scalar form** — used driver-side by the control plane
  (``streaming/control.py``), where commands arrive one at a time and the
  reference's raise-on-bad-param contract applies.
- **Column-expression form** — the same rules as vectorized predicates for
  validating command *streams* in bulk (the ``command_validation`` query):
  at 100 TB a command-audit table is validated as one scan with zero Python
  in the loop, rejects routed to a dead-letter side, never an exception.

``tests/test_validators.py`` pins the two forms against each other on the
reference's own docstring examples, so they cannot drift.

Rule table (reference file:line):

| rule | accept | normalize | validators.py |
|---|---|---|---|
| model_id | non-empty string after strip | strip | :49-88 |
| max_fps  | numeric coercion, > 0 | float | :90-134 |
| source_id| numeric coercion, >= 0 | int (truncate) | :136-180 |
| stream URI | scheme + non-empty remainder | — | config.py:134-150 |
| mqtt_port | 1..65535 | int | config.py:114-116 |
| confidence | 0 <= x <= 1 | float | config.py:128-132 |
| metrics_interval | >= 0 | float | config.py:122-126 |
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class CommandValidationError(ValueError):
    """Command/config parameter failed validation (message is client-safe)."""


# scheme ":" then a non-empty netloc-or-path — the columnar equivalent of
# urlparse's `scheme and (netloc or path)` check (reference
# config.py:145-148): "//" must be followed by something ("rtsp://" alone
# parses to empty netloc AND empty path → invalid), while a plain,
# bare-slash ("file:/" → path "/", accepted by urlparse), or single-slash
# remainder is a path. Alternation, not `(//)?.+`, because the optional
# group would backtrack and let `.+` swallow the bare slashes. Anchored, so
# Spark rlike and DuckDB regexp_matches (both partial-match engines) behave
# as a full match.
URI_REGEX = "^[A-Za-z][A-Za-z0-9+.-]*:(//.+|/|/?[^/].*)$"


# -- Python scalar form (driver-side control plane) --------------------------


def validate_model_id(model_id: Any) -> str:
    """Non-empty string, strip-normalized (validators.py:49-88)."""
    if not isinstance(model_id, str):
        raise CommandValidationError(
            f"Invalid model_id: must be string, got {type(model_id).__name__}"
        )
    stripped = model_id.strip()
    if not stripped:
        raise CommandValidationError(
            f"Invalid model_id: must be non-empty string (got {model_id!r})"
        )
    return stripped


def validate_fps(fps: Any) -> float:
    """Numeric coercion (decimal strings accepted), > 0 (validators.py:90-134)."""
    try:
        fps_float = float(fps)
    except (ValueError, TypeError) as e:
        raise CommandValidationError(f"Invalid max_fps: must be numeric, got {fps!r}") from e
    if fps_float <= 0:
        raise CommandValidationError(f"Invalid max_fps: must be > 0, got {fps_float}")
    return fps_float


def validate_source_id(source_id: Any) -> int:
    """Numeric coercion, truncating like int(); >= 0 (validators.py:136-180).

    Truncation runs BEFORE the negativity check, exactly like the
    reference's ``int(source_id)`` — so ``-0.5`` truncates to 0 and passes.
    NaN and infinities are rejected (int() raises on both; OverflowError
    for inf is folded into the same client-safe error).

    Accepts decimal *strings* too (`"3.99"` -> 3) so the scalar and columnar
    forms agree: a column can't distinguish the reference's int("3.99")
    (raises) from int(3.99) (truncates), so both forms take the permissive
    branch.

    Finite doubles beyond ±2^63 are rejected, matching the columnar form's
    bigint range (``source_id_trunc``): ids past 2^63 are out of any
    protocol's range, and accepting them only in the scalar form was a
    latent scalar/columnar parity gap.
    """
    try:
        source_id_float = float(source_id)
        source_id_int = int(source_id_float)
    except (ValueError, TypeError, OverflowError) as e:
        raise CommandValidationError(
            f"Invalid source_id: must be numeric, got {source_id!r}"
        ) from e
    if not -9.223372036854775e18 <= source_id_float <= 9.223372036854775e18:
        raise CommandValidationError(
            f"Invalid source_id: out of 64-bit range, got {source_id!r}"
        )
    if source_id_int < 0:
        raise CommandValidationError(
            f"Invalid source_id: cannot be negative, got {source_id_int}"
        )
    return source_id_int


def is_valid_uri(uri: Any) -> bool:
    """Scheme plus non-empty remainder (config.py:134-150)."""
    import re

    return isinstance(uri, str) and re.match(URI_REGEX, uri) is not None


def validate_stream_uri(uri: Any) -> str:
    if not is_valid_uri(uri):
        raise CommandValidationError(f"Invalid stream URI: {uri!r}")
    return uri


def validate_port(port: Any) -> int:
    """1..65535 (config.py:114-116)."""
    try:
        port_int = int(port)
    except (ValueError, TypeError) as e:
        raise CommandValidationError(f"Invalid port: must be numeric, got {port!r}") from e
    if not (1 <= port_int <= 65535):
        raise CommandValidationError(f"Invalid port: {port_int}")
    return port_int


def validate_confidence(confidence: Any) -> float:
    """0 <= x <= 1 (config.py:128-132)."""
    try:
        conf = float(confidence)
    except (ValueError, TypeError) as e:
        raise CommandValidationError(
            f"Invalid confidence_threshold: must be numeric, got {confidence!r}"
        ) from e
    if not (0.0 <= conf <= 1.0):
        raise CommandValidationError(
            f"confidence_threshold must be between 0 and 1, got {conf}"
        )
    return conf


def validate_metrics_interval(interval: Any) -> float:
    """>= 0, 0 meaning disabled (config.py:122-126)."""
    try:
        iv = float(interval)
    except (ValueError, TypeError) as e:
        raise CommandValidationError(
            f"Invalid metrics_reporting_interval: must be numeric, got {interval!r}"
        ) from e
    if iv < 0:
        raise CommandValidationError(
            f"metrics_reporting_interval cannot be negative, got {iv}"
        )
    return iv


# -- column-expression form (bulk validation, zero Python in the loop) -------


def model_id_ok(raw: Column) -> Column:
    return raw.isNotNull() & (F.trim(raw) != "")


def model_id_norm(raw: Column) -> Column:
    return F.when(model_id_ok(raw), F.trim(raw))


def fps_num(raw: Column) -> Column:
    return raw.try_cast("double")


def fps_ok(raw: Column) -> Column:
    n = fps_num(raw)
    return n.isNotNull() & (n > 0)


def source_id_num(raw: Column) -> Column:
    return raw.try_cast("double")


def source_id_trunc(raw: Column) -> Column:
    # double→bigint cast truncates toward zero, same as Python int() —
    # applied BEFORE the >= 0 check, mirroring the reference's
    # int(source_id)-then-negativity-test order (validators.py:168-180):
    # -0.5 truncates to 0 and passes, matching the scalar form. NaN and
    # the infinities are nulled FIRST: Spark's non-ANSI NaN.cast(int) is
    # 0 and inf clamps, where the scalar int() raises — both forms must
    # reject. The bound is the double just below 2^63 (DuckDB's bigint
    # cast errors past it; the scalar form has no bound, but ids beyond
    # 2^63 are out of any protocol's range).
    n = source_id_num(raw)
    return F.when(
        ~F.isnan(n) & n.between(-9.223372036854775e18, 9.223372036854775e18),
        n.cast("bigint"),
    )


def source_id_ok(raw: Column) -> Column:
    t = source_id_trunc(raw)
    return t.isNotNull() & (t >= 0)


def source_id_norm(raw: Column) -> Column:
    return F.when(source_id_ok(raw), source_id_trunc(raw))


def uri_ok(raw: Column) -> Column:
    return raw.isNotNull() & raw.rlike(URI_REGEX)


def port_ok(raw: Column) -> Column:
    n = raw.try_cast("int")
    return n.isNotNull() & n.between(1, 65535)


def confidence_ok(raw: Column) -> Column:
    n = raw.try_cast("double")
    return n.isNotNull() & n.between(0.0, 1.0)


__all__ = [
    "CommandValidationError",
    "URI_REGEX",
    "validate_model_id",
    "validate_fps",
    "validate_source_id",
    "is_valid_uri",
    "validate_stream_uri",
    "validate_port",
    "validate_confidence",
    "validate_metrics_interval",
    "model_id_ok",
    "model_id_norm",
    "fps_ok",
    "fps_num",
    "source_id_ok",
    "source_id_num",
    "source_id_trunc",
    "source_id_norm",
    "uri_ok",
    "port_ok",
    "confidence_ok",
]
