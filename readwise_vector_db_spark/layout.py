"""Layout versioning for persisted index artifacts (round 10).

Every persisted index layout (PQ / IVF-PQ / IVF / quantizer / warm
search index) carries a ``layout.json`` stamp — ``{"layout_version": N,
"family": "..."}`` — the analogue of the reference's alembic version
table for its Postgres schema
(``/root/reference/alembic/versions/6e900a582819_create_initial_tables.py:27-56``;
studied, not copied): a loader must know WHICH on-disk contract it is
reading before it trusts the bytes.  Rules:

- Savers stamp the layout atomically (tmp + rename) as the LAST step,
  so a half-written build is never stamped.
- Loaders call :func:`check_layout`: an unstamped directory is a
  legacy v1 layout (pre-round-10 builds — structurally identical to
  v2, which only ADDED the stamp, so it loads fine); a stamp from a
  NEWER engine refuses loudly with a migration hint instead of
  misreading bytes whose contract it doesn't know; a stamp for a
  DIFFERENT family refuses loudly (loading an ivfpq layout through
  the pq loader "works" structurally and serves wrong results).
- :func:`migrate_layout` upgrades a legacy layout in place after
  validating its expected structure — the add-nullable-column-class
  migration path, so "re-build everything because the engine
  versioned its layouts" never happens.
"""

from __future__ import annotations

import json
import os

# The CURRENT on-disk contract version.  History:
#   1 — implicit (pre-round-10): no stamp file.
#   2 — round 10: identical structure + the stamp itself; sidecars
#       rescore.json / filter_columns.json / tombstones / rotation are
#       all optional within it.
LAYOUT_VERSION = 2

_STAMP = "layout.json"


class LayoutVersionError(ValueError):
    """The persisted layout's version or family doesn't match what
    this loader can read — includes a migration hint."""


def stamp_layout(path: str, family: str, extra: dict | None = None) -> None:
    """Write the layout stamp atomically.  Called last by savers."""
    os.makedirs(path, exist_ok=True)
    rec = {"layout_version": LAYOUT_VERSION, "family": family}
    if extra:
        rec.update(extra)
    tmp = os.path.join(path, f"{_STAMP}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(path, _STAMP))


def read_stamp(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _STAMP)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None
    except (OSError, ValueError) as e:
        raise LayoutVersionError(
            f"unreadable layout stamp at {path}/{_STAMP}: {e}; the layout "
            "may be mid-write or corrupt — rebuild it, or restore the "
            "stamp with migrate_layout(path, family) if the data dirs "
            "are intact"
        )


def check_layout(path: str, family) -> int:
    """Validate the stamp before a loader trusts the directory.
    ``family`` may be a string or a tuple of acceptable families (e.g.
    a quantizer loader legitimately reads the centroid table of an ivf
    or ivfpq layout).  Returns the layout version (1 for unstamped
    legacy layouts)."""
    families = (family,) if isinstance(family, str) else tuple(family)
    rec = read_stamp(path)
    if rec is None:
        return 1  # legacy pre-stamp layout: structurally v2-readable
    got_family = rec.get("family")
    if got_family not in families:
        raise LayoutVersionError(
            f"layout at {path!r} is family {got_family!r}, not "
            f"{' / '.join(map(repr, families))} — use the matching "
            f"load_{got_family}_index loader"
        )
    v = int(rec.get("layout_version", 0))
    if v > LAYOUT_VERSION:
        raise LayoutVersionError(
            f"layout at {path!r} is version {v}, built by a newer engine "
            f"(this engine reads ≤ {LAYOUT_VERSION}) — upgrade the engine "
            "or rebuild the index with this one"
        )
    if v < 1:
        raise LayoutVersionError(
            f"layout at {path!r} carries an invalid version stamp {v!r} — "
            "rebuild, or migrate_layout() if the data dirs are intact"
        )
    return v


def migrate_layout(path: str, family: str, required: tuple[str, ...]) -> int:
    """Stamp a legacy (v1) layout up to the current version after
    validating that its expected data directories exist.  Idempotent;
    returns the resulting version."""
    rec = read_stamp(path)
    if rec is not None:
        return check_layout(path, family)
    missing = [d for d in required if not os.path.isdir(os.path.join(path, d))]
    if missing:
        raise LayoutVersionError(
            f"cannot migrate {path!r} to a {family!r} layout: missing "
            f"required dirs {missing} — this doesn't look like a legacy "
            f"{family} index"
        )
    stamp_layout(path, family)
    return LAYOUT_VERSION
