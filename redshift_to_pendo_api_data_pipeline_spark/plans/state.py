"""Bookmark / state store.

Singer state semantics re-implemented (SURVEY.md §2.8):

- state shape ``{"currently_syncing": ..., "bookmarks": {stream: {
  replication_key, replication_key_value, version}}}``
  (tap-redshift/state.json, bookmarks.py:7-48);
- ``build_state`` merges a prior state file with the catalog's replication
  settings, dropping bookmarks whose replication key changed
  (sync.py:215-257);
- version stamp = epoch millis, minted once per FULL_TABLE sync
  (sync.py:209-212) and used for ACTIVATE_VERSION swap semantics;
- resume: ``currently_syncing`` + skip-already-done (bookmarks.py:42-48).

The bookmark value itself is computed as ``max(replication_key)`` over the
successfully-sunk rows (not last-row-under-ORDER-BY as the reference does,
sync.py:188-194) and committed only after the sink succeeds — mirroring the
pipe design where the *target* echoes state (README.md:191-192).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field as dc_field
from datetime import date, datetime
from pathlib import Path

from redshift_to_pendo_api_data_pipeline_spark.schema import StreamSpec


def now_version() -> int:
    """Epoch-millis table version stamp (sync.py:209-212)."""
    return int(time.time() * 1000)


def _jsonable(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


@dataclass
class State:
    currently_syncing: str | None = None
    bookmarks: dict[str, dict] = dc_field(default_factory=dict)

    # -- bookmark accessors (bookmarks.py:7-40 semantics) ------------------
    def get_bookmark(self, stream: str, key: str, default=None):
        return self.bookmarks.get(stream, {}).get(key, default)

    def write_bookmark(self, stream: str, key: str, value) -> None:
        self.bookmarks.setdefault(stream, {})[key] = _jsonable(value)

    # -- persistence --------------------------------------------------------
    def to_dict(self) -> dict:
        return {"currently_syncing": self.currently_syncing, "bookmarks": self.bookmarks}

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2, default=_jsonable))

    @classmethod
    def load(cls, path: str | Path) -> "State":
        p = Path(path)
        if not p.exists():
            return cls()
        raw = json.loads(p.read_text() or "{}")
        return cls(
            currently_syncing=raw.get("currently_syncing"),
            bookmarks=raw.get("bookmarks", {}),
        )


def build_state(prior: State, streams: list[StreamSpec]) -> State:
    """Merge prior bookmarks with catalog replication settings
    (sync.py:215-257): keep a bookmark only if the stream is still
    INCREMENTAL *and* its replication key is unchanged; carry the version
    stamp for FULL_TABLE streams so an interrupted versioned swap resumes.
    """
    out = State(currently_syncing=prior.currently_syncing)
    for s in streams:
        old = prior.bookmarks.get(s.name, {})
        if s.replication_method == "INCREMENTAL":
            assert s.replication_key is not None
            entry = {"replication_key": s.replication_key}
            if old.get("replication_key") == s.replication_key:
                if "replication_key_value" in old:
                    entry["replication_key_value"] = old["replication_key_value"]
            if "version" in old:
                entry["version"] = old["version"]
            out.bookmarks[s.name] = entry
        else:  # FULL_TABLE keeps only the version stamp
            if "version" in old:
                out.bookmarks[s.name] = {"version": old["version"]}
    return out


def streams_to_sync(streams: list[StreamSpec], state: State) -> list[StreamSpec]:
    """Resume support: skip streams before ``currently_syncing``
    (resolve.py:72-75 dropwhile)."""
    if not state.currently_syncing:
        return list(streams)
    names = [s.name for s in streams]
    if state.currently_syncing not in names:
        return list(streams)
    idx = names.index(state.currently_syncing)
    return list(streams[idx:])
