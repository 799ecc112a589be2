"""Filesystem abstraction for the table-layout side channel.

Everything heavy in the engine (blocks parquet, manifest parquet) moves
through Spark writers and works on any Hadoop-supported storage. What
does NOT go through Spark is the table layout's side channel: the
`snapshot.json` pointer, the side-band manifest part files written by
encode tasks, the publish step that moves them into place, and the
compaction commit. Raw `os.*` there would pin the flagship write path to
a shared POSIX namespace — false on any real cluster (S3/GCS/HDFS).

This module routes all of that through `pyarrow.fs`:

- plain paths and `file://` URIs resolve to `LocalFileSystem`
- other URI schemes resolve through `pyarrow.fs.FileSystem.from_uri`
  (s3://, gs://, hdfs://, ... — whatever the installed pyarrow supports)
- tests/users can `register_filesystem("scheme", factory)` to inject a
  custom `pyarrow.fs.FileSystem` (e.g. a mock object store)

Commit discipline per store capability:

- stores WITH atomic rename (local, HDFS): write `<final>.tmp-<uuid>`
  then move — readers never observe a torn file, and replacing
  `snapshot.json` is an atomic pointer swap.
- stores WITHOUT rename (object stores): write the FINAL name directly.
  Object-store PUTs are all-or-nothing (the object appears only when the
  upload completes), so a killed writer leaves nothing, and overwriting
  `snapshot.json` is still an atomic pointer swap. `move()` degrades to
  copy+delete, which the layout only uses for small metadata files.
"""

from __future__ import annotations

import posixpath
import uuid

from pyarrow import fs as pafs

# scheme -> factory(uri) -> (fs, fs_internal_path) or
#                           (fs, fs_internal_path, supports_atomic_rename)
_REGISTRY: dict = {}

_LOCAL = pafs.LocalFileSystem()


def register_filesystem(scheme: str, factory) -> None:
    """Inject a filesystem for a URI scheme (tests, custom stores).
    `factory(uri)` returns (fs, path[, atomic_rename]); atomic_rename
    defaults to False — the safe assumption for an object store."""
    _REGISTRY[scheme] = factory


def unregister_filesystem(scheme: str) -> None:
    _REGISTRY.pop(scheme, None)


def resolve(path: str) -> tuple[pafs.FileSystem, str, bool]:
    """path/URI -> (filesystem, fs-internal path, supports_atomic_rename)."""
    if "://" not in path:
        return _LOCAL, path, True
    scheme = path.split("://", 1)[0]
    if scheme == "file":
        return _LOCAL, "/" + path.split("://", 1)[1].lstrip("/"), True
    if scheme in _REGISTRY:
        out = _REGISTRY[scheme](path)
        return (out[0], out[1], False) if len(out) == 2 else tuple(out)
    fs, p = pafs.FileSystem.from_uri(path)
    atomic = isinstance(fs, (pafs.LocalFileSystem, pafs.HadoopFileSystem))
    return fs, p, atomic


def _info(path: str) -> pafs.FileInfo:
    fs, p, _ = resolve(path)
    return fs.get_file_info(p)


def exists(path: str) -> bool:
    return _info(path).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    return _info(path).type == pafs.FileType.Directory


def mkdirs(path: str) -> None:
    fs, p, _ = resolve(path)
    fs.create_dir(p, recursive=True)


def list_infos(path: str) -> list[tuple[str, bool]]:
    """Immediate children of `path` as (base_name, is_dir), sorted.
    Missing directory -> empty list."""
    fs, p, _ = resolve(path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    out = [
        (posixpath.basename(i.path.rstrip("/")), i.type == pafs.FileType.Directory)
        for i in fs.get_file_info(sel)
    ]
    return sorted(out)


def listdir(path: str) -> list[str]:
    return [name for name, _ in list_infos(path)]


def list_files(path: str) -> list[str]:
    """All files under `path`, recursive, as fs-internal full paths
    (pair with the filesystem handle from resolve() for opens).
    Missing directory -> empty list."""
    fs, p, _ = resolve(path)
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    return sorted(
        i.path for i in fs.get_file_info(sel) if i.type == pafs.FileType.File
    )


def read_bytes(path: str) -> bytes:
    fs, p, _ = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes_atomic(path: str, data: bytes) -> None:
    """All-or-nothing small-file write (see module docstring for the
    per-store mechanics)."""
    fs, p, atomic = resolve(path)
    if atomic:
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, p)
    else:
        with fs.open_output_stream(p) as f:
            f.write(data)


def write_parquet_atomic(path: str, table, compression: str = "snappy") -> None:
    """All-or-nothing parquet write of an in-memory Arrow table (used for
    the small side-band manifest parts, never for data)."""
    import pyarrow.parquet as pq

    fs, p, atomic = resolve(path)
    if atomic:
        tmp = f"{p}.inprogress-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp, filesystem=fs, compression=compression)
        fs.move(tmp, p)
    else:
        pq.write_table(table, p, filesystem=fs, compression=compression)


def move(src: str, dst: str) -> None:
    """Move a file; copy+delete where the store has no rename or when the
    endpoints live on different filesystems. (Directories only via rename
    on a single rename-capable store.)"""
    fs_s, ps, atomic = resolve(src)
    fs_d, pd, _ = resolve(dst)
    same_fs = fs_s is fs_d or fs_s.equals(fs_d)
    if same_fs and atomic:
        fs_s.move(ps, pd)
        return
    # cross-store (or rename-less) path: stream src -> dst on each side's
    # own filesystem handle — renaming across stores is never possible
    with fs_s.open_input_stream(ps) as fin, fs_d.open_output_stream(pd) as fout:
        while chunk := fin.read(4 << 20):
            fout.write(chunk)
    fs_s.delete_file(ps)


def delete_file(path: str) -> None:
    fs, p, _ = resolve(path)
    try:
        fs.delete_file(p)
    except FileNotFoundError:
        pass


def delete_dir(path: str) -> None:
    fs, p, _ = resolve(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


def delete_any(path: str) -> None:
    info = _info(path)
    if info.type == pafs.FileType.Directory:
        delete_dir(path)
    elif info.type != pafs.FileType.NotFound:
        delete_file(path)
