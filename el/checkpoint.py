"""Per-stage Parquet checkpoints with lineage manifests.

The reference's checkpoint pattern is materialized resource files,
existence-checked at startup, with a --fromScratch flag to force rebuild
(ResourceHelper.scala:8-31, RunKBPEntityLinkerSystem.scala:213, 228; the
per-query append writers SerializeCorefOffsetsData.scala:39-77). Ours is
the batch-pipeline equivalent: each stage writes
``<root>/stage-<name>/`` as a directory of Parquet part files plus a
``manifest.json`` recording the lineage fingerprint (inputs + parameters
+ code version) and row counters. A rerun with the same fingerprint
skips the stage and reads the checkpoint; ``from_scratch`` mirrors the
reference flag. Writes are atomic (temp dir + rename), so a killed run
never leaves a half-written stage that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable
from typing import Any

CODE_VERSION = 2  # bump to invalidate all checkpoints on semantic changes


def _input_stat(path: str) -> list:
    """(size, mtime_ns) of a file, or the sorted per-file stats of a
    directory of part files — so regenerating an input at the same path
    invalidates dependent checkpoints (content proxy, not just name)."""
    try:
        if os.path.isdir(path):
            out = []
            for name in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, name))
                out.append([name, st.st_size, st.st_mtime_ns])
            return out
        st = os.stat(path)
        return [st.st_size, st.st_mtime_ns]
    except OSError:
        return []


def fingerprint(spec: dict[str, Any]) -> str:
    stats = {
        k: _input_stat(v)
        for k, v in spec.items()
        if isinstance(v, str) and os.path.exists(v)
    }
    payload = json.dumps(
        {"code_version": CODE_VERSION, "input_stats": stats, **spec},
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _write_part(tbl, path: str) -> int:
    """Plain-task parquet writer for one materialized block."""
    import pyarrow.parquet as pq

    pq.write_table(tbl, path)
    return tbl.num_rows


def _read_part(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


class CheckpointManager:
    def __init__(self, root: str | None, from_scratch: bool = False):
        self.root = root
        self.from_scratch = from_scratch
        self.events: list[dict] = []  # what ran vs what was skipped

    def _load_manifest(self, name: str, fp: str) -> dict | None:
        dest = os.path.join(self.root, f"stage-{name}")
        man_path = os.path.join(dest, "manifest.json")
        if self.from_scratch or not os.path.exists(man_path):
            return None
        try:
            with open(man_path) as f:
                man = json.load(f)
            if man.get("fingerprint") == fp:
                return man
        except (json.JSONDecodeError, OSError):
            pass
        return None

    def _commit(self, name: str, tmp: str, manifest: dict) -> str:
        dest = os.path.join(self.root, f"stage-{name}")
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)
        return dest

    def _tmp(self, name: str) -> str:
        tmp = os.path.join(self.root, f".tmp-{name}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        return tmp

    def stage_block_refs(self, name: str, spec: dict[str, Any],
                         build: Callable[[], list]):
        """Fast-plan stage over MATERIALIZED BLOCK REFS (plain Ray
        tasks, no Dataset): ``build`` returns a list of
        ObjectRef[pa.Table]; each block persists as one parquet part
        (in-task, parallel) so block identity — internal sort and
        non-overlapping (conv_id, turn_idx) ranges per block — survives
        the round trip, which the fused plan's sort-free sink relies
        on. Resume relaunches one read task per part, in part order."""
        import ray

        if self.root is None:
            self.events.append({"stage": name, "action": "streamed"})
            return build()
        fp = fingerprint({"stage": name, **spec})
        if self._load_manifest(name, fp) is not None:
            data = os.path.join(self.root, f"stage-{name}", "data")
            parts = sorted(
                os.path.join(data, p) for p in os.listdir(data))
            self.events.append(
                {"stage": name, "action": "resumed", "parts": len(parts)})
            read_rem = ray.remote(_read_part)
            return [read_rem.remote(p) for p in parts]
        refs = build()
        tmp = self._tmp(name)
        write_rem = ray.remote(_write_part)
        rows = sum(ray.get([
            write_rem.remote(
                r, os.path.join(tmp, "data", f"part-{i:06d}.parquet"))
            for i, r in enumerate(refs)
        ]))
        self._commit(name, tmp, {"stage": name, "fingerprint": fp,
                                 "rows": rows, "spec": spec})
        self.events.append({"stage": name, "action": "ran", "rows": rows})
        return refs

    def load_tables(self, name: str, spec: dict[str, Any]) -> dict | None:
        """Resume a driver-scale multi-table stage saved by
        :meth:`save_tables` -> {key: pa.Table} or None. Split load/save
        (instead of a build callback) because the fast plan interleaves
        these stages with work that must be SKIPPED entirely on
        resume."""
        import pyarrow.parquet as pq

        if self.root is None:
            return None
        fp = fingerprint({"stage": name, **spec})
        if self._load_manifest(name, fp) is None:
            return None
        data = os.path.join(self.root, f"stage-{name}", "data")
        out = {
            p[:-len(".parquet")]: pq.read_table(os.path.join(data, p))
            for p in sorted(os.listdir(data))
        }
        self.events.append({"stage": name, "action": "resumed",
                            "tables": sorted(out)})
        return out

    def save_tables(self, name: str, spec: dict[str, Any],
                    tables: dict) -> None:
        import pyarrow.parquet as pq

        if self.root is None:
            return
        fp = fingerprint({"stage": name, **spec})
        tmp = self._tmp(name)
        rows = {}
        for k, t in tables.items():
            pq.write_table(t, os.path.join(tmp, "data", f"{k}.parquet"))
            rows[k] = t.num_rows
        self._commit(name, tmp, {"stage": name, "fingerprint": fp,
                                 "rows": rows, "spec": spec})
        self.events.append({"stage": name, "action": "ran", "rows": rows})

    def stage(self, name: str, spec: dict[str, Any], build: Callable[[], Any],
              materialize: bool = True):
        """Run (or resume) one stage. ``build`` returns a Dataset; with no
        checkpoint root, multi-consumer stages are pinned in the object
        store (``materialize=True``), single-consumer stages stream
        (``materialize=False`` — every Ray Data execution costs ~1s of
        executor startup, so fusing single-use stages into their consumer
        is a measured win)."""
        import ray.data

        if self.root is None:
            if not materialize:
                self.events.append({"stage": name, "action": "streamed"})
                return build()
            self.events.append({"stage": name, "action": "materialized"})
            return build().materialize()
        fp = fingerprint({"stage": name, **spec})
        # NOTE: no "=" in the dir name — hive-style "stage=<name>" paths
        # would be partition-inferred by read_parquet and leak a column.
        dest = os.path.join(self.root, f"stage-{name}")
        man_path = os.path.join(dest, "manifest.json")
        if not self.from_scratch and os.path.exists(man_path):
            try:
                with open(man_path) as f:
                    man = json.load(f)
                if man.get("fingerprint") == fp:
                    self.events.append(
                        {"stage": name, "action": "resumed", "rows": man.get("rows")}
                    )
                    return ray.data.read_parquet(os.path.join(dest, "data"))
            except (json.JSONDecodeError, OSError):
                pass
        ds = build()
        tmp = os.path.join(self.root, f".tmp-{name}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        from .shuffle import arrowize

        # strip pandas schema metadata before writing: blocks re-read
        # from the checkpoint otherwise carry it and defeat Ray's schema
        # deduplication in every downstream exchange
        arrowize(ds).write_parquet(os.path.join(tmp, "data"))
        rows = ray.data.read_parquet(os.path.join(tmp, "data")).count()
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(
                {"stage": name, "fingerprint": fp, "rows": rows, "spec": spec},
                f, indent=1, sort_keys=True,
            )
        shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)
        self.events.append({"stage": name, "action": "ran", "rows": rows})
        return ray.data.read_parquet(os.path.join(dest, "data"))
