"""Checkpoint lineage: a regenerated input at the SAME path must
invalidate dependent stages (ADVICE r01 — fingerprints include per-file
size+mtime, not just names)."""

import json
import os
import shutil

from el.checkpoint import CheckpointManager, fingerprint


def test_fingerprint_tracks_input_content(tmp_path):
    p = tmp_path / "input.parquet"
    p.write_bytes(b"aaa")
    f1 = fingerprint({"input": str(p)})
    assert f1 == fingerprint({"input": str(p)})  # stable
    p.write_bytes(b"aaab")  # same path, new content
    assert fingerprint({"input": str(p)}) != f1


def test_fingerprint_tracks_directory_parts(tmp_path):
    d = tmp_path / "parts"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 10)
    f1 = fingerprint({"input": str(d)})
    (d / "part-1.parquet").write_bytes(b"y")  # extra part file
    assert fingerprint({"input": str(d)}) != f1


def test_stage_invalidates_on_input_change(tmp_path, ray_session, t1_fixture):
    """Copy the fixture, checkpoint a stage, regenerate the input in
    place -> the stage must RUN again, not resume stale output."""
    import ray.data

    src = os.path.join(t1_fixture, "gold_mentions.parquet")
    inp = str(tmp_path / "in.parquet")
    shutil.copy(src, inp)
    ck = str(tmp_path / "ckpt")

    def build():
        return ray.data.read_parquet(inp)

    m1 = CheckpointManager(ck)
    m1.stage("s", {"input": inp}, build)
    assert m1.events[-1]["action"] == "ran"
    m2 = CheckpointManager(ck)
    m2.stage("s", {"input": inp}, build)
    assert m2.events[-1]["action"] == "resumed"
    # "regenerate" the input: same path, valid parquet, different stat
    import pyarrow.parquet as pq

    t = pq.read_table(inp)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), inp)
    m3 = CheckpointManager(ck)
    m3.stage("s", {"input": inp}, build)
    assert m3.events[-1]["action"] == "ran"
    man = json.load(open(os.path.join(ck, "stage-s", "manifest.json")))
    assert man["stage"] == "s"
