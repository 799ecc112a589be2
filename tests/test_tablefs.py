"""tablefs: the object-storage abstraction for the table-layout side
channel (snapshot pointer, side-band manifest parts, publish, compaction
commit). Proves the side channel works on a RENAME-LESS store — a mock
object store whose move() raises, exactly like S3 — via write-final-name
commits and copy+delete moves."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyarrow import fs as pafs

from parquet_spark import tablefs


class RenamelessHandler(pafs.FileSystemHandler):
    """Mock object store: delegates to a rooted LocalFileSystem but
    forbids move/rename (like S3) and records every operation."""

    def __init__(self, root: str):
        self.root = root
        self.local = pafs.LocalFileSystem()
        self.ops: list[str] = []

    def _full(self, path: str) -> str:
        return os.path.join(self.root, path.lstrip("/"))

    def get_type_name(self):
        return "mock-object-store"

    def normalize_path(self, path):
        return path

    def get_file_info(self, paths):
        self.ops.append("get_file_info")
        return [self.local.get_file_info(self._full(p)) for p in paths]

    def get_file_info_selector(self, selector):
        self.ops.append("get_file_info_selector")
        sel = pafs.FileSelector(
            self._full(selector.base_dir),
            recursive=selector.recursive,
            allow_not_found=selector.allow_not_found,
        )
        return self.local.get_file_info(sel)

    def create_dir(self, path, recursive):
        self.ops.append("create_dir")
        self.local.create_dir(self._full(path), recursive=recursive)

    def delete_dir(self, path):
        self.ops.append("delete_dir")
        self.local.delete_dir(self._full(path))

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.ops.append("delete_dir_contents")
        self.local.delete_dir_contents(self._full(path), missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self.local.delete_dir_contents(self.root)

    def delete_file(self, path):
        self.ops.append("delete_file")
        self.local.delete_file(self._full(path))

    def move(self, src, dest):
        self.ops.append("move")
        raise NotImplementedError("object store has no rename")

    def copy_file(self, src, dest):
        self.ops.append("copy_file")
        self.local.copy_file(self._full(src), self._full(dest))

    def open_input_stream(self, path):
        self.ops.append("open_input_stream")
        return self.local.open_input_stream(self._full(path))

    def open_input_file(self, path):
        self.ops.append("open_input_file")
        return self.local.open_input_file(self._full(path))

    def open_output_stream(self, path, metadata):
        self.ops.append("open_output_stream")
        full = self._full(path)
        # object stores have no directories — any key is writable; the
        # local delegate needs the parent to exist
        self.local.create_dir(os.path.dirname(full), recursive=True)
        return self.local.open_output_stream(full)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError


@pytest.fixture()
def mockfs(tmp_path):
    handler = RenamelessHandler(str(tmp_path))
    fs = pafs.PyFileSystem(handler)
    tablefs.register_filesystem(
        "mock", lambda uri: (fs, uri.split("://", 1)[1], False)
    )
    yield handler
    tablefs.unregister_filesystem("mock")


def test_resolve_local_and_file_uri(tmp_path):
    fs, p, atomic = tablefs.resolve(str(tmp_path))
    assert isinstance(fs, pafs.LocalFileSystem) and p == str(tmp_path) and atomic
    fs2, p2, atomic2 = tablefs.resolve("file://" + str(tmp_path))
    assert isinstance(fs2, pafs.LocalFileSystem) and p2 == str(tmp_path) and atomic2


def test_local_atomic_write_leaves_no_tmp(tmp_path):
    target = str(tmp_path / "x.json")
    tablefs.write_bytes_atomic(target, b'{"a": 1}')
    assert tablefs.read_bytes(target) == b'{"a": 1}'
    assert os.listdir(tmp_path) == ["x.json"]  # tmp file moved, not left


def test_mock_store_write_is_final_name_no_rename(mockfs):
    tablefs.write_bytes_atomic("mock://tbl/snapshot.json", b"{}")
    assert tablefs.read_bytes("mock://tbl/snapshot.json") == b"{}"
    assert "move" not in mockfs.ops  # write-final-name, never rename


def test_mock_store_move_degrades_to_copy_delete(mockfs):
    tablefs.mkdirs("mock://tbl/a")
    tablefs.write_bytes_atomic("mock://tbl/a/f.bin", b"payload")
    tablefs.move("mock://tbl/a/f.bin", "mock://tbl/a/g.bin")
    assert tablefs.read_bytes("mock://tbl/a/g.bin") == b"payload"
    assert not tablefs.exists("mock://tbl/a/f.bin")
    assert "move" not in mockfs.ops


def test_snapshot_roundtrip_on_rename_less_store(mockfs):
    from parquet_spark.operators.encode import read_snapshot, write_snapshot
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField("x", IntegerType())])
    write_snapshot("mock://t1", schema.json(), ["x"], "fp-1", {"n_buckets": 4})
    snap = read_snapshot("mock://t1")
    assert snap["fingerprint"] == "fp-1" and snap["n_buckets"] == 4
    assert read_snapshot("mock://does-not-exist") is None
    assert "move" not in mockfs.ops
    # overwrite = atomic pointer swap (PUT semantics)
    write_snapshot("mock://t1", schema.json(), ["x"], "fp-2", {"n_buckets": 8})
    assert read_snapshot("mock://t1")["fingerprint"] == "fp-2"


def test_sideband_manifest_write_and_publish_on_rename_less_store(mockfs):
    """The encode task's side-band manifest part write and the driver's
    publish step — the exact mechanics VERDICT r3 flagged as POSIX-only —
    end-to-end on a store with no rename."""
    from parquet_spark.operators.encode import (
        _MANIFEST_PA_SCHEMA,
        _encode_fn,
        _publish_manifest,
    )

    pending = "mock://tbl/manifest/_pending-run1"
    man_dir = "mock://tbl/manifest"
    tablefs.mkdirs(pending)

    # run the encode generator in-process (as an executor task would)
    batch = pa.record_batch({
        "doc_id": pa.array(["a", "b", "c"], pa.string()),
        "n_tok": pa.array([1, 2, 3], pa.int32()),
    })
    fn = _encode_fn(["doc_id", "n_tok"], 16384, None, None, False,
                    stats_cols=["n_tok"], manifest_dir=pending)
    blocks = list(fn(iter([batch])))
    assert len(blocks) == 1

    parts = [f for f in tablefs.listdir(pending) if f.endswith(".parquet")]
    assert len(parts) == 1  # task wrote its side-band part
    _publish_manifest(pending, man_dir, clear=False)
    assert not tablefs.exists(pending)
    published = [f for f in tablefs.listdir(man_dir) if f.endswith(".parquet")]
    assert len(published) == 1 and published[0].startswith("part-run1-")
    # the published part is a readable manifest parquet
    fs, p, _ = tablefs.resolve(os.path.join(man_dir, published[0]))
    tbl = pq.read_table(p, filesystem=fs)
    assert tbl.schema.equals(_MANIFEST_PA_SCHEMA)
    assert set(tbl.column("column").to_pylist()) == {"doc_id", "n_tok"}
    assert "move" not in mockfs.ops


def test_publish_clear_and_stale_pending_cleanup_on_mock(mockfs):
    from parquet_spark.operators.encode import _publish_manifest

    man_dir = "mock://t2/manifest"
    tablefs.mkdirs(man_dir)
    tablefs.write_bytes_atomic(os.path.join(man_dir, "part-old-00001.parquet"), b"old")
    tablefs.mkdirs(os.path.join(man_dir, "_pending-stale"))
    tablefs.write_bytes_atomic(
        os.path.join(man_dir, "_pending-stale", "part-00000-0.parquet"), b"zzz"
    )
    pending = os.path.join(man_dir, "_pending-fresh")
    tablefs.mkdirs(pending)
    tablefs.write_bytes_atomic(os.path.join(pending, "part-00000-0.parquet"), b"new")
    _publish_manifest(pending, man_dir, clear=True)
    names = tablefs.listdir(man_dir)
    assert names == ["part-fresh-00000-0.parquet"]  # old part + stale pending gone
    assert "move" not in mockfs.ops


def test_list_infos_and_delete_any(tmp_path):
    d = tmp_path / "d"
    d.mkdir()
    (d / "f.txt").write_text("x")
    (d / "sub").mkdir()
    infos = tablefs.list_infos(str(d))
    assert infos == [("f.txt", False), ("sub", True)]
    tablefs.delete_any(str(d / "f.txt"))
    tablefs.delete_any(str(d / "sub"))
    assert tablefs.list_infos(str(d)) == []
    assert tablefs.listdir(str(d / "missing")) == []


def test_cross_filesystem_move(mockfs, tmp_path):
    """Regression (advisor finding): move() with endpoints on DIFFERENT
    filesystems must stream src->dst on each side's own handle (never
    rename, never write to the wrong store)."""
    src = tmp_path / "outside.bin"
    src.write_bytes(b"payload" * 1000)
    dst = "mock://moved/outside.bin"
    tablefs.mkdirs("mock://moved")
    tablefs.move(str(src), dst)
    assert tablefs.read_bytes(dst) == b"payload" * 1000
    assert not src.exists()
    assert "move" not in mockfs.ops  # cross-store: copy+delete, no rename


def test_same_local_filesystem_move_still_renames(tmp_path):
    src = tmp_path / "a.bin"
    src.write_bytes(b"x")
    tablefs.move(str(src), str(tmp_path / "b.bin"))
    assert (tmp_path / "b.bin").read_bytes() == b"x"
    assert not src.exists()


def test_list_files_recursive(tmp_path):
    d = tmp_path / "root"
    (d / "batch=0").mkdir(parents=True)
    (d / "batch=1").mkdir()
    (d / "batch=0" / "a.parquet").write_bytes(b"x")
    (d / "batch=1" / "b.parquet").write_bytes(b"y")
    (d / "top.parquet").write_bytes(b"z")
    got = tablefs.list_files(str(d))
    assert [p.rsplit("/", 1)[-1] for p in got] == ["a.parquet", "b.parquet", "top.parquet"]
    assert tablefs.list_files(str(tmp_path / "missing")) == []
