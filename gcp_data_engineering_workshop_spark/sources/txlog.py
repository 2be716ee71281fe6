"""Transaction-log table format (SURVEY.md §2 E22) — the ACID
table layer the engine was carrying as its one declared gap
(VERDICT r6/r7 "no transactional table format").

This is a minimal log-structured table protocol in the public
Delta-Lake-paper shape (Armbrust et al., VLDB'20: an ordered commit
log of add/remove file actions over immutable parquet data files,
snapshot isolation by log replay, optimistic concurrency by atomic
commit-file creation, periodic checkpoints so readers replay O(1)
recent commits instead of the whole history, per-file column
statistics so DML prunes to the files it actually touches) —
implemented from the paper's ideas only, no Delta/Iceberg code or
wire compatibility.

Layout under a table root:
    _txlog/00000000000000000001.json      one commit = one version
    _txlog/00000000000000000002.json
    _txlog/checkpoint-<V>.json            table state + a pointer to
    _txlog/checkpoint-<V>.files.parquet   the COLUMNAR live-file set
                                          (r13; legacy checkpoints
                                           inline "files" JSON and
                                           still read)
    part-<uuid>.parquet                   immutable data files
    col=value/part-<uuid>.parquet         (hive-partitioned tables,
                                           r11: spec recorded in the
                                           log like schema)

Guarantees (each pytest-enforced):
- ATOMICITY: data files are invisible until the commit file exists;
  a crashed writer leaves only unreferenced parquet (garbage, never
  corruption). The commit entry is written to a temp file and made
  visible via os.link(tmp, version_file) — the link either fully
  exists with its complete content or not at all, so a concurrent
  reader can never open a half-written commit (and link() fails
  with FileExistsError, preserving the exclusive version claim).
- ISOLATION (snapshot): readers resolve the live file set from the
  log as of a version and read only those files; concurrent commits
  never change what an in-flight read sees.
- OPTIMISTIC CONCURRENCY: a committer that loses the version race
  re-reads the log and retries against the new head. Two appends
  serialize (both land, distinct versions); read-modify-write ops
  (overwrite/merge/optimize) carry the snapshot version they read
  and fail with CommitConflict if the head moved.
- TIME TRAVEL: read(version=N) replays the log prefix. vacuum()
  with the default retention keeps recently-referenced files; like
  the paper's VACUUM, deep-history time travel is bounded by the
  retention window once checkpoints exist (see vacuum()).
- CHECKPOINTS: every ``checkpoint_every`` commits the full live set
  (plus the per-app streaming txn watermarks) is written as a
  COLUMNAR pair — checkpoint-<V>.files.parquet for the file
  entries, checkpoint-<V>.json for the table-level state (r13, the
  Delta parquet-checkpoint shape; legacy inline-JSON checkpoints
  still read). Readers start from the newest usable checkpoint <=
  target and replay only the suffix — O(1) resolution at steady
  state, the property that makes a million-commit table readable —
  and the file entries load LAZILY through a shared arrow store
  with a per-(root, version) snapshot cache, so a million-FILE
  table resolves in sub-millisecond too and a pruned plan
  materializes only its survivors. The stream sink's idempotence
  check and vacuum's reference scan ride the same suffix bound.

FILE-LEVEL GRANULARITY (the r8->r9 upgrade): every add action
carries per-file min/max column stats lifted from the parquet
FOOTER of the staged file (no data read). merge_upsert uses them to
rewrite ONLY the files whose key range intersects the update keys —
a 0.1%-of-keys daily upsert of a 100 TB table rewrites the handful
of files holding those keys, not the table; optimize() compacts
only the under-target files and leaves full-size files untouched.
Untouched files keep their add metadata verbatim and their bytes on
disk are never opened (pytest proves both).

Scale notes: the LOG carries file-level metadata only (path + size
+ footer stats), never data; commits are O(files touched). Data
file writes go through Spark's normal distributed parquet writer
into a staging directory and are moved (same-filesystem rename)
under the root before commit — at object-store scale the "move"
becomes copy-free because files are written in place with unique
names; the staging hop here keeps local-FS semantics simple and
atomic.
"""

from __future__ import annotations

import functools
import json
import math
import os
import re
import shutil
import tempfile
import time
import uuid
from collections.abc import MutableMapping
from datetime import timezone as _tz

_utc = _tz.utc

from pyspark.sql import DataFrame

LOG_DIR = "_txlog"
_W = 20  # zero-padded version width


class CommitConflict(Exception):
    """A concurrent commit made this transaction non-serializable
    (e.g. the table was overwritten after this writer's snapshot)."""


class ConstraintViolation(Exception):
    """A write contains rows that make a table CHECK constraint
    FALSE (SQL semantics: NULL passes — a constraint rejects only
    provable violations)."""


class SchemaMismatch(Exception):
    """The write's schema differs from the table's recorded schema
    and the caller did not opt into evolution (merge_schema=True) —
    or the evolution is unsafe (a shared column changed type, or a
    column disappeared). Schema ENFORCEMENT is the Delta-paper
    feature that keeps a typo'd producer from silently landing a
    divergent file the readers then trip over."""


def _schema_check(df: DataFrame, table_schema: str | None,
                  merge_schema: bool) -> str | None:
    """Returns the schema JSON to RECORD in this commit (None when
    the table schema is unchanged). Enforcement rules:
    - first write (table_schema None): record df's schema;
    - identical schema: record nothing;
    - merge_schema=False: raise SchemaMismatch;
    - merge_schema=True: df may ADD columns (no table column may
      disappear from the union — old files simply lack the new
      columns and read() fills them with NULL via the recorded
      schema) and shared columns may WIDEN losslessly (r12, the
      public Delta type-widening set: the integer chain,
      float->double, same-scale decimal precision growth — see
      _widens_to): a wider write widens the TABLE, a narrower
      write is accepted as-is and reads through the wider recorded
      schema; any other type change refuses. Records the evolved
      schema.

    Nullability is NOT part of the contract: parquet stores every
    column optional and Spark sources disagree about it constantly
    (spark.range is non-null, a JSON stream is nullable) — recorded
    schemas are uniformly nullable and comparisons use simpleString,
    which ignores nullability at every nesting level."""
    return _schema_check_struct(df.schema, table_schema,
                                merge_schema)


_WIDEN_CHAINS = (("tinyint", "smallint", "int", "bigint"),
                 ("float", "double"))
_DECIMAL_RE = re.compile(r"decimal\((\d+),(\d+)\)")


def _widens_to(frm: str, to: str) -> bool:
    """True when a file written as ``frm`` reads LOSSLESSLY through
    a recorded schema of ``to`` — the public Delta type-widening
    set this engine supports: the integer chain, float->double, and
    same-scale decimal precision growth. Both read paths honor it
    (Spark 4's parquet reader upcasts at scan, the arrow path casts
    in _arrow_project)."""
    for chain in _WIDEN_CHAINS:
        if frm in chain and to in chain:
            return chain.index(frm) < chain.index(to)
    mf, mt = _DECIMAL_RE.fullmatch(frm), _DECIMAL_RE.fullmatch(to)
    if mf and mt:
        return (mf.group(2) == mt.group(2)
                and int(mf.group(1)) < int(mt.group(1)))
    return False


def _schema_check_struct(schema, table_schema: str | None,
                         merge_schema: bool) -> str | None:
    """_schema_check on a bare StructType — the native writer path
    has the declared write schema but no DataFrame."""
    from pyspark.sql.types import StructField, StructType

    new = StructType([StructField(f.name, f.dataType, True)
                      for f in schema.fields])
    if table_schema is None:
        return new.json()
    cur = StructType.fromJson(json.loads(table_schema))
    if new.simpleString() == cur.simpleString():
        return None
    if not merge_schema:
        raise SchemaMismatch(
            f"write schema {new.simpleString()} != table schema "
            f"{cur.simpleString()}; pass merge_schema=True to evolve")
    new_by_name = {f.name: f for f in new.fields}
    cur_by_name = {f.name: f for f in cur.fields}
    evolved_fields = []
    widened = False
    for cf in cur.fields:
        nf = new_by_name.get(cf.name)
        if nf is None:
            # every table column survives evolution (a narrower
            # write's files just lack it on disk and read back as
            # NULL through the recorded schema)
            evolved_fields.append(cf)
            continue
        ct, nt = (cf.dataType.simpleString(),
                  nf.dataType.simpleString())
        if ct == nt:
            evolved_fields.append(cf)
        elif _widens_to(ct, nt):
            # TYPE WIDENING (r12, the public Delta feature): the
            # write is wider — the TABLE widens; every older file
            # reads losslessly through the new type
            evolved_fields.append(nf)
            widened = True
        elif _widens_to(nt, ct):
            # the write is narrower — accepted as-is: its files
            # store the narrow type and read through the table's
            # wider recorded schema (no schema change)
            evolved_fields.append(cf)
        else:
            raise SchemaMismatch(
                f"column {cf.name} changes type {ct} -> {nt}; "
                f"only lossless widening (int chain, "
                f"float->double, same-scale decimal precision) is "
                f"evolvable")
    evolved = StructType(
        evolved_fields
        + [f for f in new.fields if f.name not in cur_by_name])
    if not widened and all(
            f.name in cur_by_name for f in new.fields):
        # nothing widened and nothing added: record no schema (a
        # pure narrower write leaves the table schema untouched)
        return None
    return evolved.json()


def _log_path(root: str) -> str:
    return os.path.join(root, LOG_DIR)


def _version_file(root: str, v: int) -> str:
    return os.path.join(_log_path(root), f"{v:0{_W}d}.json")


def _list_versions(root: str) -> list[int]:
    d = _log_path(root)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(d)
                  if f.endswith(".json") and not f.startswith("checkpoint")
                  and not f.startswith("tmp-")
                  and not f.startswith("_"))  # _reader-* cursors


def _list_checkpoints(root: str) -> list[int]:
    d = _log_path(root)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[len("checkpoint-"):-5]) for f in os.listdir(d)
                  if f.startswith("checkpoint-") and f.endswith(".json"))


class _CpStore:
    """One COLUMNAR checkpoint's file entries — an immutable,
    lazily-loaded view of ``checkpoint-<v>.files.parquet`` (columns
    ``path`` string, ``meta`` JSON string). This is the Delta
    protocol's parquet-checkpoint idea (VERDICT r12 #1): at the
    ~1M-file regime a 166 MB JSON checkpoint costs ~9 s and multi-GB
    driver RSS to parse per query; the columnar form loads in one
    arrow read, holds paths/metas as shared arrow buffers, and
    parses an entry's meta JSON only when something actually asks
    for that file. Instances are shared across snapshots of the
    same checkpoint (see _cp_store) and NEVER mutated — suffix
    adds/removes live in the _LazyFiles wrapper."""

    __slots__ = ("path", "n", "_tbl", "_paths", "_idx", "_parsed",
                 "_overlay", "_stats_tbl", "_has_stats", "_fbytes")

    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n          # row count, recorded in the JSON meta
        self._fbytes: dict = {}  # footer-bytes cache (immutable)
        self._tbl = None    # pa.Table once loaded
        self._paths = None  # list[str] once materialized
        self._idx = None    # {path: row_no} once materialized
        self._parsed: dict[int, dict] = {}   # row_no -> meta dict
        self._overlay: dict[str, dict] = {}  # distributed-prune
        # prefetch: path -> meta, lets a pruned plan resolve its
        # few survivors without materializing the 1M-path index
        self._stats_tbl = None  # stats-only projection (r14)
        self._has_stats = None  # schema carries stats_parsed cols?

    def table(self):
        if self._tbl is None:
            import pyarrow.parquet as pq
            self._tbl = pq.read_table(self.path)
            self.n = self._tbl.num_rows
        return self._tbl

    def has_stats(self) -> bool:
        """Does the checkpoint carry stats_parsed columns? Answered
        from parquet FOOTER metadata — no data read."""
        if self._has_stats is None:
            if self._tbl is not None:
                names = self._tbl.schema.names
            else:
                import pyarrow.parquet as pq
                try:
                    names = pq.read_schema(self.path).names
                except OSError:
                    names = []
            self._has_stats = any(
                nm.startswith(_CP_STAT_PREFIXES) for nm in names)
        return self._has_stats

    def stats_table(self):
        """The vector prune's working set: path + stats_parsed
        columns ONLY — the meta JSON strings (the checkpoint's
        heavy 90%) stay on disk; survivors fetch theirs by row
        index (row-group-targeted take). Reuses the full table
        when something already loaded it."""
        if self._tbl is not None:
            return self._tbl
        if self._stats_tbl is None:
            import pyarrow.parquet as pq
            cols = [nm for nm in pq.read_schema(self.path).names
                    if nm == "path"
                    or nm.startswith(_CP_STAT_PREFIXES)]
            self._stats_tbl = pq.read_table(self.path,
                                            columns=cols)
            self.n = self._stats_tbl.num_rows
        return self._stats_tbl

    def _footer_bytes(self, col_filter=None, tag="all") -> int:
        """Uncompressed bytes of (a projection of) this checkpoint,
        answered from the parquet FOOTER only — no data read. Used
        to pick resident vs streamed metadata regimes BEFORE any
        buffer lands. Cached per tag (the file is immutable)."""
        import pyarrow.parquet as pq
        got = self._fbytes.get(tag)
        if got is not None:
            return got
        try:
            md = pq.ParquetFile(self.path).metadata
        except OSError:
            return 0
        total = 0
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for c in range(rgm.num_columns):
                cc = rgm.column(c)
                if col_filter is None or col_filter(
                        cc.path_in_schema):
                    total += cc.total_uncompressed_size
        self._fbytes[tag] = total
        return total

    def stats_stream(self):
        """Yield ``(row_offset, table_slice)`` of the stats_parsed
        projection, one parquet row group at a time (VERDICT r14
        #1: the vectorized prune's peak working set must be ONE row
        group — ~131k rows, a few MB — regardless of table size,
        not the whole projection resident). Three regimes:

        - something already loaded the full/stats table: one yield
          of the resident buffers (free);
        - small projection (footer bytes <= _CP_STREAM_BYTES): load
          resident via stats_table() — caching small checkpoints
          keeps repeat plans at r14 speed;
        - big projection: stream pf.read_row_group slices of the
          STAT columns only (no path — masks don't need it;
          survivors fetch path+meta by row index), caching
          NOTHING."""
        import pyarrow.parquet as pq
        if (self._tbl is not None or self._stats_tbl is not None
                or self._footer_bytes(
                    lambda nm: nm == "path"
                    or nm.startswith(_CP_STAT_PREFIXES), "stats")
                <= _CP_STREAM_BYTES):
            yield 0, self.stats_table()
            return
        pf = pq.ParquetFile(self.path)
        cols = [nm for nm in pf.schema_arrow.names
                if nm.startswith(_CP_STAT_PREFIXES)]
        self.n = pf.metadata.num_rows
        off = 0
        for rg in range(pf.metadata.num_row_groups):
            sl = pf.read_row_group(rg, columns=cols)
            yield off, sl
            off += sl.num_rows

    def paths(self) -> list[str]:
        if self._paths is None:
            self._paths = self.table().column("path").to_pylist()
        return self._paths

    def idx(self) -> dict:
        if self._idx is None:
            self._idx = {p: i for i, p in enumerate(self.paths())}
        return self._idx

    def meta(self, path: str) -> dict | None:
        ov = self._overlay.get(path)
        if ov is not None:
            return ov
        i = self.idx().get(path)
        if i is None:
            return None
        m = self._parsed.get(i)
        if m is None:
            m = self._parsed[i] = json.loads(
                self.table().column("meta")[i].as_py())
        return m

    def items(self):
        # full iteration parses TRANSIENT dicts (no _parsed fill):
        # a one-shot full-scan plan over a million files must not
        # leave a million cached dicts behind — point access via
        # meta() is the cached path
        metas = self.table().column("meta").to_pylist()
        for i, p in enumerate(self.paths()):
            m = self._parsed.get(i)
            yield p, (m if m is not None else json.loads(metas[i]))


# Checkpoint stores are immutable once written, so they cache per
# (file path, mtime_ns) — the mtime guards a test-style rm-rf +
# recreate under the same path. Bounded by BYTES, not depth (r14,
# VERDICT r13 #8): a store's weight is its resident arrow buffers
# plus its parsed/overlay dicts, so a session touching dozens of
# small tables keeps every hit while one 1M-file store can't pin
# more than its real footprint. LRU by access; the just-used entry
# never evicts.
_CP_STORES: "dict[tuple, _CpStore]" = {}
# Budget for stores OTHER than the one just used: the in-use entry
# is exempt by design (evicting the table being planned would only
# force an immediate re-read), so a session's resident metadata is
# bounded by (budget + one store's weight) — and the streamed
# regimes below keep that one store's weight itself bounded
# (_CP_STREAM_BYTES) on million-file tables.
_CP_STORES_BYTES = 256 * 1024 * 1024
# Above this footer-measured uncompressed projection size, the
# vectorized prune / merge-touch / incremental-checkpoint paths
# STREAM the checkpoint one row group at a time instead of pinning
# resident arrow buffers (VERDICT r14 #1: 1M files measured 356 MB
# store / 1.7 GB RSS resident; streamed peak is one row group and
# the store weight stays ~KB). Below it, resident caching keeps
# small-table repeat plans free. NOTE: footer
# total_uncompressed_size counts ENCODED page bytes
# (dictionary/RLE), which under-reads decoded arrow memory ~2x on
# string-heavy projections — 32 MB here bounds the resident form
# at roughly 64 MB of arrow (1M files measured 45 MB footer /
# 89 MB arrow, streams correctly).
_CP_STREAM_BYTES = int(os.environ.get(
    "SPARK_GRAFT_TXLOG_STREAM_BYTES", 32 * 1024 * 1024))
# Survivor-fetch regime split for the streamed vectorized prune: at
# or below this many survivors (or n/4 if larger) a row-group-
# targeted take fetches path+meta; above it a sequential filtered
# pass over the checkpoint wins (and keeps peak memory at one row
# group). Module-level so the property suite can force either path.
_PRUNE_TAKE_BOUND = 10_000


def _store_weight(st: "_CpStore") -> int:
    """Resident bytes of one cached store — arrow buffers (the
    heavy piece; ~0 while unloaded) plus rough per-entry costs of
    the lazy python-side maps."""
    w = 4096
    if st._tbl is not None:
        w += st._tbl.nbytes
    if st._stats_tbl is not None and st._stats_tbl is not st._tbl:
        w += st._stats_tbl.nbytes
    if st._paths is not None:
        w += 100 * len(st._paths)
    if st._idx is not None:
        w += 150 * len(st._idx)
    w += 600 * (len(st._parsed) + len(st._overlay))
    return w


def _cp_store(path: str, n: int) -> _CpStore:
    try:
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:
        return _CpStore(path, n)  # torn: caller's exists-check gates
    st = _CP_STORES.pop(key, None)
    if st is None:
        st = _CpStore(path, n)
    _CP_STORES[key] = st  # (re)insert at the recent end
    total = sum(_store_weight(s) for s in _CP_STORES.values())
    for k in list(_CP_STORES):
        if total <= _CP_STORES_BYTES or len(_CP_STORES) == 1:
            break
        if k == key:
            continue  # never evict the entry just used
        total -= _store_weight(_CP_STORES.pop(k))
    return st


class _LazyFiles(MutableMapping):
    """The snapshot's live-file map when the table has a columnar
    checkpoint: the checkpoint's entries stay in the shared
    immutable _CpStore; the log SUFFIX's adds and removes live here
    as plain dicts/sets. Reads resolve suffix-first (an add SHADOWS
    the checkpoint row for the same path — the dv-update re-add
    shape), tombstones hide checkpoint rows, and full iteration
    materializes metas lazily. copy() is O(suffix): the store is
    shared, so the per-(root, version) snapshot cache can hand each
    caller an isolated map without re-reading anything."""

    __slots__ = ("_store", "_added", "_removed")

    def __init__(self, store: _CpStore | None = None):
        self._store = store
        self._added: dict[str, dict] = {}
        self._removed: set[str] = set()

    def copy(self) -> "_LazyFiles":
        new = _LazyFiles(self._store)
        new._added = dict(self._added)
        new._removed = set(self._removed)
        return new

    def __getitem__(self, p: str) -> dict:
        m = self._added.get(p)
        if m is not None:
            return m
        if p in self._removed or self._store is None:
            raise KeyError(p)
        m = self._store.meta(p)
        if m is None:
            raise KeyError(p)
        return m

    def __setitem__(self, p: str, m: dict) -> None:
        self._added[p] = m
        self._removed.discard(p)

    def __delitem__(self, p: str) -> None:
        had = self._added.pop(p, None)
        # blind tombstone: the path may (also) exist in the store;
        # checking would force the 1M-path index, and a tombstone
        # for a path the store never had is harmless
        self._removed.add(p)
        if had is None and (self._store is None
                            or self._store.meta(p) is None):
            self._removed.discard(p)
            raise KeyError(p)

    def discard(self, p: str) -> None:
        """Remove-if-present WITHOUT resolving the store (the
        snapshot-replay hot path: a remove action's meta is never
        needed, and resolving it would force the full path index a
        million-file replay exists to avoid). A tombstone for a
        path the store never had is harmless."""
        self._added.pop(p, None)
        self._removed.add(p)

    def pop(self, p, *default):
        # full Mapping semantics (returns the STORED meta even when
        # it lives in the checkpoint store — code-review r13); hot
        # paths that don't need the value use discard()
        try:
            m = self[p]
        except KeyError:
            if default:
                return default[0]
            raise
        self._added.pop(p, None)
        self._removed.add(p)
        return m

    def __iter__(self):
        yield from self._added
        if self._store is not None:
            dead = self._removed | set(self._added)
            for p in self._store.paths():
                if p not in dead:
                    yield p

    def items(self):
        # the bulk path planners use: suffix entries from their
        # dicts, store entries straight off the arrow buffers
        for p, m in self._added.items():
            yield p, m
        if self._store is not None:
            dead = self._removed | set(self._added)
            for p, m in self._store.items():
                if p not in dead:
                    yield p, m

    def values(self):
        for _p, m in self.items():
            yield m

    def __len__(self) -> int:
        if self._store is None:
            return len(self._added)
        if not self._removed and not self._added:
            return self._store.n
        idx = self._store.idx()
        hide = sum(1 for p in self._removed if p in idx)
        hide += sum(1 for p in self._added if p in idx)
        return self._store.n - hide + len(self._added)

    def __bool__(self) -> bool:
        if self._added:
            return True
        if self._store is None or self._store.n == 0:
            return False
        if not self._removed:
            return True
        if len(self._removed) < self._store.n:
            # even if every tombstone hits the store, a row survives
            return True
        return any(True for _ in iter(self))

    def __contains__(self, p) -> bool:
        if p in self._added:
            return True
        if p in self._removed or self._store is None:
            return False
        return self._store.meta(p) is not None

    def get(self, p, default=None):
        try:
            return self[p]
        except KeyError:
            return default


# Table FEATURES this implementation can read correctly — the Delta
# protocol/table-features idea (reader versioning): a commit that
# first uses a semantics-changing capability records it, snapshots
# carry the cumulative set, and ANY access to a table whose features
# exceed this set refuses with a clear message instead of silently
# misreading (a reader without deletion-vector support would
# resurrect deleted rows; one without column mapping would see
# physical names or miss columns). Features are monotone — never
# removed — exactly like Delta's protocol upgrades; time travel to a
# version before a feature's first use replays the smaller set.
SUPPORTED_FEATURES = frozenset({"deletion-vectors", "column-mapping",
                                "generated-columns",
                                "columnar-checkpoint"})


class UnsupportedTableFeature(Exception):
    pass


# Resolved snapshots cache per (root, version, head-commit file
# identity): a committed version file never changes, so a resolved
# snapshot is immutable — repeated plans in one session pay the
# checkpoint load + suffix replay ONCE (VERDICT r12 #1). The stat
# signature guards test-style rm-rf + recreate under the same path.
# Entries hand out copy-on-write views (_snap_copy), so callers can
# replay suffixes into them without poisoning the cache. Bounded by
# BYTES (r14, VERDICT r13 #8): a small-table snapshot weighs its
# file-dict, a columnar one only its suffix overlays (the store is
# weighed in _CP_STORES) — so a session touching many tables keeps
# every hit instead of thrashing a depth-8 LRU.
_SNAPSHOTS: dict[tuple, dict] = {}
_SNAPSHOTS_BYTES = 64 * 1024 * 1024


def _snap_weight(snap: dict) -> int:
    files = snap["files"]
    if isinstance(files, _LazyFiles):
        n = len(files._added) + len(files._removed)
    else:
        n = len(files)
    return 4096 + 700 * n


def _snap_copy(snap: dict) -> dict:
    out = dict(snap)
    files = snap["files"]
    out["files"] = (files.copy() if isinstance(files, _LazyFiles)
                    else dict(files))
    for k in ("txn", "colmap", "generated", "bloom", "constraints"):
        out[k] = dict(snap[k])
    out["partition_by"] = list(snap["partition_by"])
    out["phys_dropped"] = list(snap["phys_dropped"])
    out["features"] = list(snap["features"])
    return out


def _load_checkpoint(root: str, v: int):
    """(checkpoint meta dict, files map) — the files map is a plain
    dict for the legacy inline-JSON format, a _LazyFiles over the
    shared _CpStore for the columnar format. None when the
    checkpoint is unusable (torn JSON / missing parquet sidecar) —
    the caller falls back to an older checkpoint or a full replay,
    degrading speed, never correctness."""
    p = os.path.join(_log_path(root), f"checkpoint-{v:0{_W}d}.json")
    try:
        with open(p) as fh:
            cp = json.load(fh)
    except (OSError, ValueError):
        return None
    if "files_parquet" in cp:
        fp = os.path.join(_log_path(root), cp["files_parquet"])
        if not os.path.exists(fp):
            return None
        return cp, _LazyFiles(_cp_store(fp, int(cp["num_files"])))
    return cp, dict(cp["files"])


def snapshot(root: str, version: int | None = None) -> dict:
    """Resolve the live file set as of ``version`` (default: head).
    Starts from the newest usable checkpoint <= version and replays
    only the log suffix. Returns {"version": v, "files": {path:
    meta}, "txn": {app_id: last committed batch id}} — ``txn`` is
    the streaming-sink watermark map (Delta's txn action), carried
    through checkpoints so the sink's idempotence check reads the
    same bounded suffix as everyone else.

    ``files`` is a Mapping: a plain dict on small/legacy tables, a
    _LazyFiles view over the columnar checkpoint otherwise — same
    interface, but a million-file table no longer parses (or even
    materializes) a million entries to plan a pruned scan.
    Resolutions are cached per (root, version): a committed version
    is immutable, so repeated plans in one session replay nothing."""
    versions = _list_versions(root)
    if version is None:
        version = versions[-1] if versions else 0
    key = None
    if version:
        try:
            st = os.stat(_version_file(root, version))
            key = (os.path.abspath(root), version,
                   st.st_ino, st.st_mtime_ns)
        except OSError:
            key = None
        if key is not None:
            hit = _SNAPSHOTS.pop(key, None)
            if hit is not None:
                _SNAPSHOTS[key] = hit  # refresh LRU recency
                return _snap_copy(hit)
    live: MutableMapping = {}
    txn: dict[str, int] = {}
    start = 0
    cp = None
    for c in reversed([c for c in _list_checkpoints(root)
                       if c <= version]):
        loaded = _load_checkpoint(root, c)
        if loaded is not None:
            cp, live = loaded
            txn = dict(cp.get("txn", {}))
            start = c
            break
    schema = None
    part_by: list[str] = []
    constraints: dict[str, str] = {}
    if cp is not None:
        schema = cp.get("schema")
        part_by = list(cp.get("partition_by", []))
        constraints = dict(cp.get("constraints", {}))
    colmap: dict[str, str] = {}
    phys_dropped: list[str] = []
    feats: set[str] = set()
    generated: dict[str, str] = {}
    bloom: dict = {}
    if cp is not None:
        colmap = dict(cp.get("colmap", {}))
        phys_dropped = list(cp.get("phys_dropped", []))
        feats = set(cp.get("features", []))
        generated = dict(cp.get("generated", {}))
        bloom = dict(cp.get("bloom", {}))
    for v in versions:
        if v <= start or v > version:
            continue
        entry = json.load(open(_version_file(root, v)))
        lazy = isinstance(live, _LazyFiles)
        for a in entry["actions"]:
            if "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                # discard() never resolves the store (a remove's
                # meta is unused); pop on a plain dict is the same
                if lazy:
                    live.discard(a["remove"]["path"])
                else:
                    live.pop(a["remove"]["path"], None)
        if "batch_id" in entry:
            app = entry.get("app_id", "stream")
            txn[app] = max(txn.get(app, -1), entry["batch_id"])
        if "schema" in entry:
            schema = entry["schema"]
        if "partition_by" in entry:
            part_by = list(entry["partition_by"])
        if "colmap" in entry:
            colmap = dict(entry["colmap"])
        if "phys_dropped" in entry:
            phys_dropped = list(entry["phys_dropped"])
        feats.update(entry.get("features", []))
        if "generated" in entry:
            generated = dict(entry["generated"])
        if "bloom" in entry:
            bloom = dict(entry["bloom"])
        if entry["op"] == "set-constraint":
            constraints[entry["name"]] = entry["expr"]
        elif entry["op"] == "drop-constraint":
            constraints.pop(entry["name"], None)
    # 'columnar-checkpoint' is a CHECKPOINT-FORMAT gate, not table
    # semantics: it lives in the checkpoint JSON so pre-columnar
    # readers refuse cleanly (ADVICE r14), but it does not describe
    # the data — strip it so snapshot features stay stable whether
    # resolution came from cache, checkpoint, or full replay
    feats.discard("columnar-checkpoint")
    unknown = feats - SUPPORTED_FEATURES
    if unknown:
        raise UnsupportedTableFeature(
            f"table under {root} uses features this reader does "
            f"not support: {sorted(unknown)} (supported: "
            f"{sorted(SUPPORTED_FEATURES)}); reading it would "
            f"silently return wrong data — upgrade the reader")
    snap = {"version": version, "files": live, "txn": txn,
            "schema": schema, "partition_by": part_by,
            "colmap": colmap, "phys_dropped": phys_dropped,
            "features": sorted(feats), "generated": generated,
            "bloom": bloom, "constraints": constraints}
    if key is not None:
        _SNAPSHOTS[key] = _snap_copy(snap)
        total = sum(_snap_weight(s) for s in _SNAPSHOTS.values())
        for k in list(_SNAPSHOTS):
            if total <= _SNAPSHOTS_BYTES or len(_SNAPSHOTS) == 1:
                break
            if k == key:
                continue  # never evict the entry just written
            total -= _snap_weight(_SNAPSHOTS.pop(k))
    return snap


def version_at(root: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution (r11): the newest version whose
    commit timestamp is <= ``ts`` (unix seconds) — Delta's
    timestamp-based time travel rule. Commit timestamps are the
    writer's clock at commit time; like Delta, ordering is by
    VERSION and a timestamp query binds to the last version not
    after it. Raises when ``ts`` predates the first commit."""
    best = None
    for v in _list_versions(root):
        e = json.load(open(_version_file(root, v)))
        if e["ts"] <= ts:
            best = v
        # no early break: multi-writer clock skew can wiggle ts a
        # little out of version order; the full scan keeps "last
        # version not after ts" exact (Delta instead rewrites
        # commit times to be monotone — same user-visible rule)
    if best is None:
        raise ValueError(
            f"no version of {root} exists at or before ts={ts}")
    return best


def describe(root: str, version: int | None = None) -> dict:
    """DESCRIBE DETAIL analog (r11): one metadata-only dict a user
    or tool reads before touching data — version, file count and
    total bytes, partition spec, schema DDL, live constraints, and
    the streaming txn watermarks. O(log suffix), zero data IO."""
    snap = snapshot(root, version)
    ddl = None
    if snap.get("schema"):
        from pyspark.sql.types import StructType
        st = StructType.fromJson(json.loads(snap["schema"]))
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in st.fields)
    return {"version": snap["version"],
            "num_files": len(snap["files"]),
            "total_bytes": sum(m.get("bytes", 0)
                               for m in snap["files"].values()),
            "num_dv_files": sum(1 for m in snap["files"].values()
                                if "dv" in m),
            "deleted_rows": sum(m["dv"].get("deleted", 0)
                                for m in snap["files"].values()
                                if "dv" in m),
            "partition_by": snap.get("partition_by", []),
            "schema_ddl": ddl,
            "colmap": dict(snap.get("colmap", {})),
            "features": list(snap.get("features", [])),
            "generated": dict(snap.get("generated", {})),
            "bloom": dict(snap.get("bloom", {})),
            "constraints": dict(snap.get("constraints", {})),
            "txn": dict(snap.get("txn", {}))}


def history(root: str) -> list[dict]:
    """The commit log, oldest first (op, version, ts, file counts) —
    plus each op's audit markers when the commit carries them
    (r11): a predicate delete/update's ``predicate`` (and ``set``),
    merge_delete's ``matched`` tag, restore's ``restored_version``,
    the stream sink's ``app_id``/``batch_id``."""
    out = []
    for v in _list_versions(root):
        e = json.load(open(_version_file(root, v)))
        row = {"version": v, "op": e["op"], "ts": e["ts"],
               "n_add": sum(1 for a in e["actions"] if "add" in a),
               "n_remove": sum(1 for a in e["actions"]
                               if "remove" in a)}
        for k in ("predicate", "set", "matched", "mode",
                  "old", "new", "name",
                  "restored_version", "app_id", "batch_id"):
            if k in e:
                row[k] = e[k]
        out.append(row)
    return out


def _footer_nulls(path: str) -> dict:
    """Per-file {column: [null_count, num_rows]} from the parquet
    footer — the stat behind IS NULL / IS NOT NULL data skipping
    (r11): null_count == 0 proves no row satisfies IS NULL,
    null_count == num_rows proves none satisfies IS NOT NULL. A
    column whose footer lacks a null count in ANY row group is
    absent (conservative)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict[str, list] = {}
    dropped: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name in dropped:
                continue
            try:
                st = col.statistics
                has = st is not None and st.null_count is not None
            except Exception:  # pyarrow can't CAST some stat types
                # (ArrowNotImplementedError on e.g. decimal stats
                # from a pyarrow-written footer) — no stat, never
                # a crash (the _bloom_load discipline)
                has = False
            if not has:
                dropped.add(name)
                agg.pop(name, None)
                continue
            cur = agg.setdefault(name, [0, 0])
            cur[0] += st.null_count
            cur[1] += row_group.num_rows
    return agg


def _dec_widen(d, is_lo: bool):
    """One DECIMAL footer stat endpoint as a directionally-widened
    float (lo rounds down, hi up): the float pair can only ever
    under-prune relative to the exact decimal range, and Python
    compares a pushed Decimal literal against floats exactly — so
    decimal range predicates prune with zero literal conversion
    (r14, VERDICT r13 #5). None = unrepresentable, stat absent."""
    import decimal as _dec

    try:
        f = float(d)
    except (OverflowError, ValueError):
        return None
    if not math.isfinite(f):
        return None
    df = _dec.Decimal(f)
    if is_lo and df > d:
        f = math.nextafter(f, -math.inf)
    elif not is_lo and df < d:
        f = math.nextafter(f, math.inf)
    return f


def _dec_stat_raw(raw, scale: int, is_lo: bool):
    """Decode one decimal stat endpoint from the footer's RAW
    physical value (big-endian two's-complement scaled integer for
    FLBA/BYTE_ARRAY, plain int for INT32/INT64 backing)."""
    import decimal as _dec

    if isinstance(raw, bytes):
        if not raw:
            return None
        unscaled = int.from_bytes(raw, "big", signed=True)
    elif isinstance(raw, int) and not isinstance(raw, bool):
        unscaled = raw
    else:
        return None
    return _dec_widen(_dec.Decimal(unscaled).scaleb(-scale), is_lo)


def _footer_stats(path: str) -> dict:
    """Per-file min/max column stats from the parquet FOOTER only
    (pyarrow metadata — zero data pages read). Primitive top-level
    int/float/str columns; DECIMAL columns land as directionally-
    widened floats (r14 — see _dec_widen); a column whose footer
    lacks min/max (or whose min/max is non-finite) is simply
    absent — consumers treat a missing stat as "may contain
    anything", the conservative direction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    dec_scale = {f_.name: f_.type.scale for f_ in pf.schema_arrow
                 if pa.types.is_decimal(f_.type)}
    agg: dict[str, list] = {}
    dropped: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name in dropped:
                continue  # nested / already disqualified
            st = None
            try:
                st = col.statistics
                has = st is not None and st.has_min_max
                mn, mx = (st.min, st.max) if has else (None, None)
            except Exception:  # pyarrow can't CAST some stat types
                # (ArrowNotImplementedError on e.g. decimal stats
                # from a pyarrow-written footer) — treat as absent
                has = False
            if not has and name in dec_scale and st is not None:
                # decimal stats: decode the raw scaled integers
                # pyarrow refuses to cast (r14)
                try:
                    if st.has_min_max:
                        mn = _dec_stat_raw(st.min_raw,
                                           dec_scale[name], True)
                        mx = _dec_stat_raw(st.max_raw,
                                           dec_scale[name], False)
                        has = mn is not None and mx is not None
                except Exception:
                    has = False
            elif has and name in dec_scale:
                # a pyarrow that CAN read decimal stats hands back
                # Decimal objects: widen the same way
                import decimal as _dec
                if isinstance(mn, _dec.Decimal):
                    mn = _dec_widen(mn, True)
                    mx = _dec_widen(mx, False)
                    has = mn is not None and mx is not None
            if not has:
                dropped.add(name)
                agg.pop(name, None)
                continue
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    dropped.add(name)
                    agg.pop(name, None)
                    continue
            if not isinstance(mn, (int, float, str)) or (
                    isinstance(mn, float)
                    and not (math.isfinite(mn) and math.isfinite(mx))):
                dropped.add(name)
                agg.pop(name, None)
                continue
            cur = agg.get(name)
            if cur is None:
                agg[name] = [mn, mx]
            else:
                if mn < cur[0]:
                    cur[0] = mn
                if mx > cur[1]:
                    cur[1] = mx
    return agg


_PART_NULL = "__HIVE_DEFAULT_PARTITION__"


def _utc_iso(dt) -> str:
    """An AWARE datetime as the sortable UTC token: 'YYYY-MM-DDTHH:
    MM:SS[.ffffff]', fraction dropped when zero. ONE formatter for
    both sides of the domain — recorded partition tokens
    (_utc_token) and normalized pushed literals (_lit_norm) must
    stay byte-identical for lexical pruning to be sound
    (code-review r14)."""
    import datetime as _dt

    u = dt.astimezone(_dt.timezone.utc)
    out = u.strftime("%Y-%m-%dT%H:%M:%S")
    if u.microsecond:
        out += f".{u.microsecond:06d}"
    return out


def _utc_token(tok: str, tz_name: str) -> str | None:
    """UTC-normalize a TIMESTAMP partition directory token (r14,
    VERDICT r13 #5): Spark renders hive timestamp tokens as wall
    time in the WRITER's session timezone — lexical compare across
    sessions is unsound, so the recorded token re-encodes as
    sortable UTC ISO-8601 with a 'T' separator ('YYYY-MM-DDTHH:MM:
    SS[.ffffff]'; the fraction is dropped when zero, and a '.'
    suffix sorts below any digit, so mixed precision stays in
    chronological code-point order). The 'T' doubles as the domain
    marker: consumers prune only 'T'-form tokens, legacy space-form
    tokens stay inert. None = unparseable, keep the raw token."""
    import datetime as _dt

    try:
        dt = _dt.datetime.fromisoformat(tok)
        if dt.tzinfo is None:
            import zoneinfo
            zi = zoneinfo.ZoneInfo(tz_name)
            dt = dt.replace(tzinfo=zi)
            # DST fall-back overlap (ADVICE r15 low): two UTC
            # instants render to the SAME wall-clock token; pinning
            # fold=0 would make the token an exact [v, v] stat that
            # wrongly excludes the other instant's rows. Ambiguous
            # wall times stay RAW (inert for pruning/merge).
            if dt.utcoffset() != dt.replace(fold=1).utcoffset():
                return None
        return _utc_iso(dt)
    except (ValueError, KeyError, OSError):
        return None


def _parse_partition_dirs(rel_dir: str,
                          partition_by: list[str]) -> dict:
    """Decode the hive-style ``col=value`` directory chain of one
    staged part file into {col: token} — tokens stay the raw
    (URL-unescaped) STRINGS the directory names carry; typing
    happens at prune time against the recorded schema. The null
    sentinel directory maps to None."""
    from urllib.parse import unquote

    out = {}
    segs = [s for s in rel_dir.replace(os.sep, "/").split("/") if s]
    if len(segs) != len(partition_by):
        raise ValueError(
            f"staged partition path {rel_dir!r} does not match "
            f"partition_by {partition_by}")
    for col, seg in zip(partition_by, segs):
        k, _, v = seg.partition("=")
        if k != col:
            raise ValueError(
                f"partition dir {seg!r} out of order vs "
                f"{partition_by}")
        v = unquote(v)
        out[col] = None if v == _PART_NULL else v
    return out


# ---------------------------------------------------------------- #
# per-file BLOOM FILTER INDEXES (point-equality data skipping)
# ---------------------------------------------------------------- #
# Footer [min,max] ranges prune RANGE predicates but are useless for
# point lookups on high-cardinality unordered columns (a uuid/user-id
# spread across every file overlaps every range). A declared bloom
# index writes one small sidecar per data file recording the file's
# distinct values for the indexed columns; `col = literal` conjuncts
# then open only the files whose filter might contain the literal —
# the Delta bloom-filter-index idea, stored per file like parquet's
# own optional bloom pages. Sidecars are immutable (rewrites recompute
# them), conservative under deletion vectors (a vectored row's value
# stays in the filter — false positives only), and absent sidecars
# simply don't prune.

_BLOOM_DIR = "_bloom"

# Max in-range update keys probed against one file's bloom sidecar
# on the merge fast path; beyond it the file is kept on its range
# alone (probing cost would rival reading the file).
_BLOOM_PROBE_BOUND = 5000

# Max range-surviving candidate files whose sidecars the DRIVER
# loads for predicate probing; beyond it the probes run as one
# Spark job (a million-file hash-scattered table's point lookup
# must not read a million JSONs through one process).
_BLOOM_DRIVER_LOAD_BOUND = 2048
_BLOOM_LN2 = math.log(2.0)


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for n distinct values at the target false
    positive rate — the standard sizing formulas."""
    m = max(64, int(-n * math.log(fpp) / (_BLOOM_LN2 ** 2)))
    k = max(1, round(m / max(n, 1) * _BLOOM_LN2))
    return m, min(k, 16)


def _bloom_key(v) -> bytes | None:
    """Deterministic byte encoding of an indexable value. Ints and
    strings only — float equality is numerically fragile and never
    a sane point-lookup key; unsupported types make the column
    unindexable in that file (conservative)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, str):
        return b"s" + v.encode()
    return None


def _bloom_hashes(key: bytes, m: int, k: int) -> list[int]:
    import hashlib

    d = hashlib.blake2b(key, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_sidecar(path: str, cols: list[str], fpp: float,
                   max_ndv: int, colmap: dict | None) -> dict | None:
    """Build the sidecar dict for one just-staged file: per indexed
    column, a base64 bitset over the file's DISTINCT values (read
    back with pyarrow, one column at a time — the same
    driver-bounded pass _footer_stats makes for ranges). A column
    whose distinct count exceeds ``max_ndv`` (or whose type isn't
    indexable) is omitted for that file — no filter, no pruning,
    never wrong.

    Entries are keyed by PHYSICAL column name (ADVICE r11): the
    logical name can be freed by drop_bloom_index + drop_column and
    later REUSED by renaming another column into it — a stale
    logically-keyed sidecar entry would then probe the wrong
    column's values and silently mis-prune. Physical names are never
    reused (_evolved_colmap tombstones every physical ever written),
    so a physically-keyed entry can never alias a different column;
    probe sites translate logical->physical via the snapshot's
    colmap. Pre-fix sidecars keyed logically simply stop matching
    under a mapping (get() misses -> no pruning, conservative)."""
    import base64

    import pyarrow.parquet as pq

    out = {}
    pf = pq.ParquetFile(path)
    names = set(pf.schema_arrow.names)
    for col in cols:
        phys = (colmap or {}).get(col, col)
        if phys not in names:
            continue
        vals = pf.read(columns=[phys]).column(0)
        import pyarrow.compute as pc
        distinct = pc.unique(vals).to_pylist()
        if len(distinct) > max_ndv:
            continue
        keys = [_bloom_key(v) for v in distinct]
        keys = [b for b in keys if b is not None]
        if not keys:
            continue
        m, k = _bloom_params(max(len(keys), 1), fpp)
        bits = bytearray((m + 7) // 8)
        for b in keys:
            for pos in _bloom_hashes(b, m, k):
                bits[pos >> 3] |= 1 << (pos & 7)
        out[phys] = {"m": m, "k": k,
                     "bits": base64.b64encode(bytes(bits)).decode()}
    return out or None


def _bloom_might_contain(entry: dict, lit) -> bool:
    import base64

    key = _bloom_key(lit)
    if key is None:
        return True  # unindexable literal: never prune
    bits = base64.b64decode(entry["bits"])
    for pos in _bloom_hashes(key, entry["m"], entry["k"]):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


# Files per consolidated sidecar JSON (VERDICT r11 #3): each build
# task writes ONE {basename: sidecar} file for its group, so a
# million-file table lists O(files/64) sidecar files instead of one
# per data file, while executor memory stays bounded (64 files x
# ~160 KB worst-case bitset per indexed column). A typical commit
# (< 64 staged files) gets exactly one sidecar file per commit.
_BLOOM_GROUP = 64


def _bloom_probe_entry(snap_root: str, ref, basename: str,
                       pcol: str):
    """Resolve one file's bloom entry for a PHYSICAL column name
    through either ref shape: legacy string refs point at a
    per-file {phys: entry} JSON; consolidated dict refs
    ({path, key}) point at a group {basename: {phys: entry}} JSON.
    Missing/torn sidecars resolve to None (no pruning)."""
    if isinstance(ref, dict):
        sc = _bloom_load(os.path.join(snap_root, ref["path"]))
        sc = (sc or {}).get(ref.get("key", basename))
    else:
        sc = _bloom_load(os.path.join(snap_root, ref))
    return (sc or {}).get(pcol)


def _build_bloom_sidecars(spark_s, root: str, jobs: list[tuple],
                          spec: dict,
                          colmap: dict | None) -> dict:
    """Distributed sidecar build shared by _stage_write and
    backfill_bloom_index: ``jobs`` = [(abs data path, basename)];
    returns {basename: ref dict}. One Spark task per _BLOOM_GROUP
    files — each task reads its files' indexed columns, builds the
    filters and writes ONE consolidated JSON under _bloom/
    (tmp+fsync+rename); the driver never touches column data (the
    serial loop measured ~70 s at 1000 files in the r11 probe; the
    group map is bounded by the slowest group)."""
    cols = list(spec["cols"])
    fpp = spec.get("fpp", 0.01)
    ndv = spec.get("max_ndv", 100_000)
    cm = dict(colmap or {})
    os.makedirs(os.path.join(root, _BLOOM_DIR), exist_ok=True)
    root_abs = os.path.abspath(root)
    groups = [jobs[i:i + _BLOOM_GROUP]
              for i in range(0, len(jobs), _BLOOM_GROUP)]

    def _mk(group):
        out = {}
        for dst, base in group:
            sc_ = _bloom_sidecar(dst, cols, fpp, ndv, cm)
            if sc_ is not None:
                out[base] = sc_
        if not out:
            return []
        brel = f"{_BLOOM_DIR}/group-{uuid.uuid4().hex}.json"
        final = os.path.join(root_abs, brel)
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(out, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        return [(b, {"path": brel, "key": b}) for b in out]

    # the closure references module-level helpers cloudpickle
    # serializes by REFERENCE — ship the package so workers spawned
    # by a foreign-cwd driver can import it (see _ship_package)
    _ship_package(spark_s)
    return dict(spark_s.sparkContext.parallelize(
        groups, len(groups)).flatMap(_mk).collect())


@functools.lru_cache(maxsize=4096)
def _bloom_load(path: str) -> dict | None:
    """Sidecars are immutable once referenced — cache by path.
    A missing OR corrupt sidecar returns None (ADVICE r11: a torn
    write whose add action still committed must degrade to
    no-pruning, never crash every later probing read); caching the
    None is safe because a referenced sidecar's bytes never change."""
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def set_bloom_index(root: str, cols: list[str], fpp: float = 0.01,
                    max_ndv: int = 100_000, max_retries: int = 5,
                    checkpoint_every: int = 10) -> int:
    """Declare a bloom index over ``cols`` (int/string columns) as a
    logged table property: every SUBSEQUENT write stages a per-file
    sidecar and `col = literal` predicates skip files whose filter
    excludes the literal. Existing files are not back-filled by the
    declaration itself (their absence of a sidecar just means no
    pruning) — run backfill_bloom_index for a SIDECAR-ONLY
    back-fill (zero data rewritten), or OPTIMIZE to rewrite them
    under the index, the Delta contract."""
    for _ in range(max_retries):
        snap = snapshot(root)
        entry = {"op": "set-bloom", "ts": time.time(),
                 "bloom": {"cols": list(cols), "fpp": fpp,
                           "max_ndv": max_ndv},
                 "actions": []}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(f"set_bloom_index lost the race under {root}")


def drop_bloom_index(root: str, max_retries: int = 5,
                     checkpoint_every: int = 10) -> int:
    for _ in range(max_retries):
        snap = snapshot(root)
        entry = {"op": "drop-bloom", "ts": time.time(),
                 "bloom": {}, "actions": []}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(f"drop_bloom_index lost the race under {root}")


def backfill_bloom_index(spark, root: str, max_retries: int = 5,
                         checkpoint_every: int = 10) -> int | None:
    """SIDECAR-ONLY index back-fill (VERDICT r11 #3): build bloom
    sidecars for live files that PREDATE the index WITHOUT
    rewriting any data — the alternative to the documented
    "run OPTIMIZE to rewrite them under the index" contract when a
    full rewrite of cold history is the wrong price for pruning.
    The sidecars build as the same distributed group job every
    write uses; each back-filled file's add action then RE-COMMITS
    with its bloom ref (the deletion-vector re-commit shape):
    zero data bytes move, history shows n_remove == 0, and the
    commit is dataChange=false — the stream and CDF planners skip
    op="bloom-backfill" exactly like optimize, and it is excluded
    from read_changes' default include_ops.

    Returns the new version, or None when every live file already
    carries a sidecar (nothing to do). Raises when no bloom index
    is declared. Loses a CAS race -> resnapshot and rebuild only
    what is still live and unindexed."""
    for _ in range(max_retries):
        snap = snapshot(root)
        spec = snap.get("bloom") or {}
        if not spec.get("cols"):
            raise ValueError(
                f"backfill_bloom_index: no bloom index declared "
                f"under {root}; set_bloom_index first")
        todo = {p: m for p, m in snap["files"].items()
                if "bloom" not in m}
        if not todo:
            return None
        jobs = [(os.path.join(root, p), os.path.basename(p))
                for p in sorted(todo)]
        built = _build_bloom_sidecars(spark, root, jobs, spec,
                                      snap.get("colmap"))
        actions = [{"add": {**m, "bloom": ref}}
                   for p, m in sorted(todo.items())
                   for ref in (built.get(os.path.basename(p)),)
                   if ref]
        if not actions:
            return None  # nothing indexable (types/ndv caps)
        entry = {"op": "bloom-backfill", "ts": time.time(),
                 "actions": actions}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"backfill_bloom_index lost the race under {root}")


def _stage_write(df: DataFrame, root: str,
                 partition_by: list[str] | None = None,
                 colmap: dict | None = None,
                 bloom: dict | None = None) -> list[dict]:
    """Distributed parquet write into a staging dir, then move each
    part under the table root with a unique name. Returns add-action
    metadata (path, bytes, footer min/max stats). Files are
    INVISIBLE to readers until the commit file lands (nothing
    references them).

    With ``partition_by`` (r11) the write lays out hive-style
    ``col=value`` directories under the root and each add action
    additionally records its decoded {col: token} partition values —
    EXACT per-file pruning metadata (a partition value is a [v, v]
    stat) the same consumers use alongside footer ranges. Partition
    columns live in directory names, not in the files, so reads go
    through basePath partition discovery (see _read_files).

    With a ``colmap`` (column mapping, r11 third stint) the data
    lands under PHYSICAL column names: `df` arrives with logical
    names and is projected logical->physical before the write, so
    footer stats, null counts and partition directory tokens are
    all physically keyed — one naming domain on disk, forever (a
    physical name never changes after a file is written; renames
    touch only the logical side)."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    if colmap and any(colmap.get(c, c) != c for c in df.columns):
        df = df.select(*[F.col(c).alias(colmap.get(c, c))
                         for c in df.columns])
        partition_by = [colmap.get(c, c)
                        for c in (partition_by or [])] or None
    stage = os.path.join(root, f"_stage-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    ts_parts: set[str] = set()
    tz_name = "UTC"
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        # timestamp partition tokens record UTC-NORMALIZED (r14):
        # the directory name stays as Spark rendered it (writer
        # session wall time), the RECORDED token is the sortable
        # UTC ISO form every consumer (pruning, the native read's
        # token injection) shares
        by_name = {f.name: f.dataType.simpleString()
                   for f in df.schema.fields}
        ts_parts = {c for c in partition_by
                    if by_name.get(c) == "timestamp"}
        if ts_parts:
            tz_name = df.sparkSession.conf.get(
                "spark.sql.session.timeZone", "UTC")
    writer.parquet(stage)
    adds = []
    for dirpath, _dirs, files in sorted(os.walk(stage)):
        rel_dir = os.path.relpath(dirpath, stage)
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, f)
            n_rows = pq.ParquetFile(src).metadata.num_rows
            if n_rows == 0:
                continue  # zero-row part: an empty write commits
                # schema (and nothing else), never dead files
            name = f"part-{uuid.uuid4().hex}.parquet"
            if partition_by:
                part = _parse_partition_dirs(rel_dir, partition_by)
                for c in ts_parts:
                    if part.get(c) is not None:
                        norm = _utc_token(part[c], tz_name)
                        if norm is not None:
                            part[c] = norm
                rel = "/".join([rel_dir.replace(os.sep, "/"), name])
                os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
            else:
                part = None
                rel = name
            dst = os.path.join(root, rel)
            os.replace(src, dst)  # same-FS atomic move
            add = {"path": rel, "bytes": os.path.getsize(dst),
                   "rows": n_rows,
                   "stats": _footer_stats(dst),
                   "nulls": _footer_nulls(dst)}
            if part is not None:
                add["partition"] = part
            adds.append(add)
    shutil.rmtree(stage, ignore_errors=True)
    if bloom and bloom.get("cols") and adds:
        # sidecar build is a DISTRIBUTED job (consolidated group
        # files, _build_bloom_sidecars): the driver never touches
        # column data
        jobs = [(os.path.join(root, a["path"]),
                 os.path.basename(a["path"])) for a in adds]
        built = _build_bloom_sidecars(df.sparkSession, root, jobs,
                                      bloom, colmap)
        for a in adds:
            ref = built.get(os.path.basename(a["path"]))
            if ref:
                a["bloom"] = ref
    return adds


def _try_commit(root: str, version: int, entry: dict) -> bool:
    """Atomically claim ``version``. The entry is fully written to a
    temp file first and published with os.link() — link creation is
    atomic AND exclusive (FileExistsError if the version is taken),
    so no reader can ever observe a partially-written commit file
    (the O_EXCL-then-write shape had that window)."""
    os.makedirs(_log_path(root), exist_ok=True)
    tmp = os.path.join(_log_path(root), f"tmp-{uuid.uuid4().hex}.part")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _version_file(root, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


# ------------------------------------------------------------------ #
# stats_parsed checkpoint columns (VERDICT r13 #1)
# ------------------------------------------------------------------ #
# Per-file pruning metadata lifted out of the meta JSON into REAL
# typed parquet columns of the columnar checkpoint — Delta's
# stats_parsed shape. Plan-time stat pruning then evaluates as
# pyarrow compute over the checkpoint buffers IN-PROCESS (no Spark
# job, no json.loads per file); only survivors parse their metas.
# Column naming (':' keeps any real column name collision-free):
#   s_lo:<phys> / s_hi:<phys>  footer [min, max], schema-typed
#   s_nn:<phys> / s_nr:<phys>  null count / row count (int64)
#   s_pt:<phys> / s_pn:<phys>  partition token (string) /
#                              token-is-NULL flag (bool; NULL cell
#                              = file carries no token for <phys>)
# All cells are NULLABLE and NULL always means "no stat" = the file
# survives — every conversion that can't be represented exactly in
# the target domain lands as NULL, so the columns can only ever
# under-prune relative to the meta JSON, never over-prune.

_CP_STAT_PREFIXES = ("s_lo:", "s_hi:", "s_nn:", "s_nr:",
                     "s_pt:", "s_pn:")


def _cp_stat_type(type_str: str | None):
    """pyarrow target type for a column's s_lo/s_hi stat columns,
    or None = that column's footer stats stay JSON-only (date /
    timestamp / decimal / bool footer stats are never recorded by
    the writer anyway; this just makes the contract explicit)."""
    import pyarrow as pa

    if type_str in ("tinyint", "smallint", "int", "bigint"):
        return pa.int64()
    if type_str in ("float", "double"):
        return pa.float64()
    if type_str is not None and type_str.startswith("decimal"):
        # decimal footer stats are recorded as directionally-
        # widened floats (r14, _dec_widen)
        return pa.float64()
    if type_str == "string":
        return pa.string()
    return None


def _cp_stat_value(v, pt, is_lo: bool):
    """One footer stat endpoint in the column's target domain, or
    None (= no stat, conservative). Ints land in a float64 column
    with DIRECTIONAL rounding (lo down, hi up) so the widened range
    can never exclude a file the exact range keeps."""
    import pyarrow as pa

    if v is None or isinstance(v, bool):
        return None
    if pa.types.is_integer(pt):
        return v if isinstance(v, int) else None
    if pa.types.is_floating(pt):
        if isinstance(v, float):
            return v if math.isfinite(v) else None
        if isinstance(v, int):
            try:
                f = float(v)
            except OverflowError:
                return None
            if is_lo and f > v:
                f = math.nextafter(f, -math.inf)
            elif not is_lo and f < v:
                f = math.nextafter(f, math.inf)
            return f
        return None
    if pa.types.is_string(pt):
        return v if isinstance(v, str) else None
    return None


def _cp_stat_arrays(metas: list, types: dict,
                    inv: dict | None) -> dict:
    """{stat column name: pa.Array} over ``metas`` (parsed meta
    dicts, row-aligned). Stats are keyed by PHYSICAL column name
    (file-side metadata is physical forever; the query-time colmap
    translates). s_lo/s_hi types come from the recorded schema;
    tables predating schema tracking infer per column from the
    values (any str+non-str mix → column omitted)."""
    import pyarrow as pa

    inv = inv or {}
    n = len(metas)

    def _target(c):
        if types:
            return _cp_stat_type(types.get(inv.get(c, c)))
        # schema-less legacy table: infer from the values
        has_i = has_f = has_s = False
        for m in metas:
            st = (m.get("stats") or {}).get(c)
            if not st:
                continue
            for v in st:
                if isinstance(v, bool) or v is None:
                    return None
                if isinstance(v, str):
                    has_s = True
                elif isinstance(v, float):
                    has_f = True
                elif isinstance(v, int):
                    has_i = True
        if has_s:
            return pa.string() if not (has_i or has_f) else None
        if has_f:
            return pa.float64()
        if has_i:
            return pa.int64()
        return None

    stat_cols: dict = {}
    null_cols: set = set()
    part_cols: set = set()
    for m in metas:
        for c in (m.get("stats") or {}):
            if c not in stat_cols:
                stat_cols[c] = _target(c)
        null_cols.update(m.get("nulls") or ())
        part_cols.update(m.get("partition") or ())
    out: dict = {}
    for c, pt in sorted(stat_cols.items()):
        if pt is None:
            continue
        lo: list = [None] * n
        hi: list = [None] * n
        for i, m in enumerate(metas):
            st = (m.get("stats") or {}).get(c)
            if st:
                lo[i] = _cp_stat_value(st[0], pt, True)
                hi[i] = _cp_stat_value(st[1], pt, False)
        out[f"s_lo:{c}"] = pa.array(lo, type=pt)
        out[f"s_hi:{c}"] = pa.array(hi, type=pt)
    for c in sorted(null_cols):
        nn: list = [None] * n
        nr: list = [None] * n
        for i, m in enumerate(metas):
            nl = (m.get("nulls") or {}).get(c)
            if (nl and isinstance(nl[0], int) and
                    isinstance(nl[1], int)
                    and not isinstance(nl[0], bool)
                    and not isinstance(nl[1], bool)):
                nn[i], nr[i] = nl
        out[f"s_nn:{c}"] = pa.array(nn, type=pa.int64())
        out[f"s_nr:{c}"] = pa.array(nr, type=pa.int64())
    for c in sorted(part_cols):
        tok: list = [None] * n
        tnul: list = [None] * n
        for i, m in enumerate(metas):
            part = m.get("partition") or {}
            if c in part:
                t = part[c]
                if t is None:
                    tnul[i] = True
                elif isinstance(t, str):
                    tok[i], tnul[i] = t, False
        out[f"s_pt:{c}"] = pa.array(tok, type=pa.string())
        out[f"s_pn:{c}"] = pa.array(tnul, type=pa.bool_())
    return out


def _cp_unify(base_schema, add_schema):
    """UNION column alignment for checkpoint tables: a column
    missing on one side fills NULL (a legacy base simply carries
    no stats until its entries churn or a full rebuild runs); an
    int64/float64 conflict on an s_lo/s_hi pair (type widening
    between checkpoints) casts the int side with one-ulp
    directional widening (sound — a widened range only ever
    under-prunes); any other type conflict nulls the column out
    (conservative). Returns ``conform(tbl)`` aligning any table —
    the whole base, ONE streamed row group of it, or the add
    table — to the union schema, so both the resident concat and
    the streamed incremental-checkpoint writer share one
    alignment."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    names = list(dict.fromkeys(list(base_schema.names)
                               + list(add_schema.names)))

    def _t(sch, name):
        i = sch.get_field_index(name)
        return sch.field(i).type if i >= 0 else None

    final: dict = {}
    nulled: set = set()
    for name in names:
        bt, at = _t(base_schema, name), _t(add_schema, name)
        if bt is None or at is None or bt == at:
            final[name] = at if at is not None else bt
        elif (name.startswith(("s_lo:", "s_hi:"))
                and {str(bt), str(at)} == {"int64", "double"}):
            final[name] = pa.float64()
        else:
            final[name] = at
            nulled.add(name)

    def _conform(tbl):
        cols = []
        for name in names:
            ft = final[name]
            st = _t(tbl.schema, name)
            if name in nulled or st is None:
                cols.append(pa.nulls(tbl.num_rows, type=ft))
            elif st == ft:
                cols.append(tbl.column(name))
            else:
                col = tbl.column(name).combine_chunks()
                v = col.to_numpy(zero_copy_only=False) \
                    .astype("float64")
                v = np.nextafter(
                    v, -np.inf if name.startswith("s_lo:")
                    else np.inf)
                mask = pc.is_null(col).to_numpy(
                    zero_copy_only=False)
                cols.append(pa.array(v, type=pa.float64(),
                                     mask=mask))
        return pa.table(dict(zip(names, cols)))

    return _conform


def _cp_concat(base, add):
    """Concat two checkpoint tables under _cp_unify alignment."""
    import pyarrow as pa

    conform = _cp_unify(base.schema, add.schema)
    return pa.concat_tables([conform(base), conform(add)])


def _maybe_checkpoint(root: str, version: int,
                      checkpoint_every: int) -> None:
    """COLUMNAR checkpoints (the Delta parquet-checkpoint shape,
    VERDICT r12 #1): file entries land in
    ``checkpoint-<v>.files.parquet`` (path, meta-JSON columns); the
    small table-level state stays in ``checkpoint-<v>.json`` with a
    ``files_parquet`` pointer. When the previous checkpoint was
    already columnar, the new one is built INCREMENTALLY on arrow
    buffers — filter out the suffix's removed/shadowed paths,
    append its adds — so checkpointing a million-file table never
    materializes a million Python dicts. The parquet sidecar lands
    (tmp+replace) BEFORE the JSON that references it, so a reader
    never sees a dangling pointer; a torn pair degrades to the
    previous checkpoint via _load_checkpoint's fallback."""
    if not (checkpoint_every and version % checkpoint_every == 0):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    snap = snapshot(root, version)
    files = snap["files"]
    store = (files._store
             if isinstance(files, _LazyFiles) else None)
    if store is not None:
        drop = files._removed | set(files._added)
        added = files._added
        # STREAM the base when it is big and not already resident
        # (VERDICT r14 #1): the incremental build then never holds
        # more than one row group of the old checkpoint — the
        # r14-measured 267 MB resident _tbl at 1M files came from
        # this load
        stream = (store._tbl is None
                  and store._footer_bytes() > _CP_STREAM_BYTES)
        base = None if stream else store.table()
        if base is not None and drop:
            base = base.filter(pc.invert(pc.is_in(
                base.column("path"),
                pa.array(sorted(drop), type=pa.string()))))
    else:
        base = None
        added = dict(files)
        drop = set()
        stream = False
    # stats_parsed columns (VERDICT r13 #1): typed per-file pruning
    # metadata rides the checkpoint as real parquet columns; the
    # incremental path computes them only for the suffix ADDS (the
    # base carries its own, filtered on arrow buffers)
    add_metas = list(added.values())
    add_cols = {"path": pa.array(list(added), type=pa.string()),
                "meta": pa.array([json.dumps(m) for m in add_metas],
                                 type=pa.string())}
    add_cols.update(_cp_stat_arrays(add_metas, _schema_types(snap),
                                    _inv_colmap(snap)))
    add_tbl = pa.table(add_cols)
    rel_parquet = f"checkpoint-{version:0{_W}d}.files.parquet"
    fpath = os.path.join(_log_path(root), rel_parquet)
    tmp = fpath + f".tmp-{uuid.uuid4().hex}"
    # bounded row groups: a pruned plan's survivor-meta take
    # decodes only the groups its row indices land in, not the
    # whole meta column
    if stream:
        conform = _cp_unify(pq.read_schema(store.path),
                            add_tbl.schema)
        add_conf = conform(add_tbl)
        drop_arr = (pa.array(sorted(drop), type=pa.string())
                    if drop else None)
        pf = pq.ParquetFile(store.path)
        num_files = 0
        writer = pq.ParquetWriter(tmp, add_conf.schema)
        try:
            for rg in range(pf.metadata.num_row_groups):
                t = pf.read_row_group(rg)
                if drop_arr is not None:
                    t = t.filter(pc.invert(pc.is_in(
                        t.column("path"), drop_arr)))
                t = conform(t)
                if t.num_rows:
                    writer.write_table(t,
                                       row_group_size=131_072)
                    num_files += t.num_rows
            if add_conf.num_rows:
                writer.write_table(add_conf,
                                   row_group_size=131_072)
                num_files += add_conf.num_rows
        finally:
            writer.close()
    else:
        tbl = (_cp_concat(base, add_tbl)
               if base is not None else add_tbl)
        pq.write_table(tbl, tmp, row_group_size=131_072)
        num_files = tbl.num_rows
    os.replace(tmp, fpath)
    path = os.path.join(_log_path(root),
                        f"checkpoint-{version:0{_W}d}.json")
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"version": snap["version"],
                   "files_parquet": rel_parquet,
                   "num_files": num_files,
                   "txn": snap["txn"],
                   "schema": snap.get("schema"),
                   "partition_by": snap.get("partition_by", []),
                   "colmap": snap.get("colmap", {}),
                   "phys_dropped": snap.get("phys_dropped", []),
                   # PROTOCOL GATE (ADVICE r14): a columnar
                   # checkpoint is a semantics-bearing format change
                   # — stamp it as a table feature, and carry an
                   # EMPTY legacy "files" stub so a pre-columnar
                   # reader loads cleanly and then refuses with the
                   # intended UnsupportedTableFeature message
                   # instead of a raw KeyError (Delta gates its
                   # parquet checkpoints via protocol versioning
                   # the same way)
                   "files": {},
                   "features": sorted(
                       set(snap.get("features", []))
                       | {"columnar-checkpoint"}),
                   "generated": snap.get("generated", {}),
                   "bloom": snap.get("bloom", {}),
                   "constraints": snap.get("constraints", {})},
                  fh)
    os.replace(tmp, path)


def _check_constraints(df: DataFrame, constraints: dict) -> None:
    """One extra distributed pass over the WRITE (not the table):
    a row violates constraint c when c evaluates to FALSE (NULL
    passes, SQL CHECK semantics). All constraints validate in a
    single job; the first offending constraint is named in the
    error. This is the enforcement cost Delta folds into its write
    job — a separate bounded pass here, worth one scan of the new
    data to keep a bad producer from poisoning the table."""
    from pyspark.sql import functions as F

    if not constraints:
        return
    names = sorted(constraints)
    flags = [F.coalesce(F.expr(constraints[n]), F.lit(True))
             .alias(f"c{i}") for i, n in enumerate(names)]
    row = df.select(*flags).agg(
        *[F.min(f"c{i}").alias(f"c{i}")
          for i in range(len(names))]).collect()[0]
    for i, n in enumerate(names):
        if row[i] is False:
            raise ConstraintViolation(
                f"constraint {n!r} ({constraints[n]}) is violated "
                f"by the write")


def add_constraint(root: str, name: str, expr: str,
                   max_retries: int = 20,
                   checkpoint_every: int = 10,
                   spark=None) -> int:
    """Record a CHECK constraint as a logged commit (auditable,
    time-travelable, CAS-serialized like every other table change).
    Enforced on every subsequent append / merge_upsert / stream
    batch. Pass ``spark`` to RETRO-VALIDATE the existing table
    before the constraint commits (Delta's ADD CONSTRAINT
    behavior) — one bounded scan; a violation leaves the log
    untouched. Without ``spark``, existing data is not checked."""
    if spark is not None:
        _check_constraints(read(spark, root), {name: expr})
    entry = {"op": "set-constraint", "ts": time.time(),
             "name": name, "expr": expr, "actions": []}
    for _ in range(max_retries):
        head = _list_versions(root)
        v = (head[-1] if head else 0) + 1
        if _try_commit(root, v, entry):
            _maybe_checkpoint(root, v, checkpoint_every)
            return v
    raise CommitConflict(f"add_constraint lost the version race "
                         f"{max_retries} times under {root}")


def drop_constraint(root: str, name: str, max_retries: int = 20,
                    checkpoint_every: int = 10) -> int:
    entry = {"op": "drop-constraint", "ts": time.time(),
             "name": name, "actions": []}
    for _ in range(max_retries):
        head = _list_versions(root)
        v = (head[-1] if head else 0) + 1
        if _try_commit(root, v, entry):
            _maybe_checkpoint(root, v, checkpoint_every)
            return v
    raise CommitConflict(f"drop_constraint lost the version race "
                         f"{max_retries} times under {root}")


def _apply_generated(df: DataFrame, gen: dict) -> DataFrame:
    """GENERATED ALWAYS AS, the write half (r11 third stint):
    columns the incoming frame OMITS are computed from their
    recorded expression; columns it PROVIDES are validated against
    it (null-safe equality through the CHECK machinery — Delta's
    implicit generated-column constraint), so a writer can never
    silently land a value that contradicts the declaration."""
    from pyspark.sql import functions as F

    if not gen:
        return df
    present = {}
    for c, expr in gen.items():
        if c in df.columns:
            present[f"generated<{c}>"] = f"{c} <=> ({expr})"
        else:
            df = df.withColumn(c, F.expr(expr))
    if present:
        _check_constraints(df, present)
    return df


def _evolved_colmap(snap: dict, rec_json: str | None) -> dict | None:
    """Column-mapping entries for the columns an evolution commit
    ADDS (r11 third stint). Returns the full new logical->physical
    map when the mapping must change — a new logical name that
    collides with a physical name ever used (a renamed column's
    original name, a dropped column's on-disk data) gets a fresh
    uuid-suffixed physical name, so old bytes can never resurrect
    under the new column — or None when the existing mapping
    (possibly identity) already covers the evolved schema."""
    if rec_json is None:
        return None
    from pyspark.sql.types import StructType

    cur = dict(snap.get("colmap") or {})
    old_fields: set[str] = set()
    if snap.get("schema"):
        old_fields = {f.name for f in StructType.fromJson(
            json.loads(snap["schema"])).fields}
    new_fields = [f.name for f in StructType.fromJson(
        json.loads(rec_json)).fields]
    used = (set(cur.values()) | set(snap.get("phys_dropped", []))
            | {cur.get(n, n) for n in old_fields})
    out = dict(cur)
    changed = False
    for n in new_fields:
        if n in old_fields or n in out:
            continue
        phys = n
        if phys in used:
            phys = f"{n}_{uuid.uuid4().hex[:8]}"
        if phys != n:
            out[n] = phys
            changed = True
        used.add(phys)
    return out if changed else None


def rename_column(root: str, old: str, new: str,
                  max_retries: int = 5,
                  checkpoint_every: int = 10) -> int:
    """RENAME COLUMN as ONE metadata commit — zero bytes rewritten
    (Delta column mapping, name mode, from the public description):
    on-disk files keep their PHYSICAL column names forever; the
    commit re-points the logical schema and records
    {new logical: physical} in the table's column map, which every
    read path (read/read_range/read_where/DML/merge/change feeds/
    the parallel stream reader) translates through. Renaming a
    column of a 100 TB table costs one JSON commit.

    Refuses: unknown/duplicate names, PARTITION columns (the
    directory layout is physical — re-partition with overwrite),
    and columns referenced by a live CHECK constraint (drop the
    constraint first; silently breaking its expression would be
    worse). Time travel to a pre-rename version returns the old
    name; RESTORE rolls the mapping back."""
    from pyspark.sql.types import StructField, StructType

    for _ in range(max_retries):
        snap = snapshot(root)
        if not snap.get("schema"):
            raise ValueError(
                f"rename_column: no recorded schema under {root}")
        st = StructType.fromJson(json.loads(snap["schema"]))
        names = [f.name for f in st.fields]
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} "
                             f"(have {names})")
        if new in names:
            raise ValueError(f"rename_column: {new!r} already exists")
        if old in (snap.get("partition_by") or []):
            raise ValueError(
                f"rename_column: {old!r} is a partition column — "
                f"the directory layout is physical; re-partition "
                f"with overwrite")
        for cname, expr in (snap.get("constraints") or {}).items():
            if re.search(rf"\b{re.escape(old)}\b", expr):
                raise ValueError(
                    f"rename_column: constraint {cname!r} "
                    f"references {old!r}; drop it first")
        for gname, gexpr in (snap.get("generated") or {}).items():
            if gname == old or re.search(
                    rf"\b{re.escape(old)}\b", gexpr):
                raise ValueError(
                    f"rename_column: {old!r} is (or feeds) the "
                    f"generated column {gname!r}; the recorded "
                    f"expression would break")
        if old in (snap.get("bloom") or {}).get("cols", []):
            raise ValueError(
                f"rename_column: {old!r} is bloom-indexed; drop "
                f"the index first (the index SPEC lists logical "
                f"names; sidecar entries themselves key physical "
                f"names and survive renames)")
        cmap = dict(snap.get("colmap") or {})
        cmap[new] = cmap.pop(old, old)
        new_st = StructType(
            [StructField(new if f.name == old else f.name,
                         f.dataType, f.nullable) for f in st.fields])
        entry = {"op": "rename-column", "ts": time.time(),
                 "old": old, "new": new,
                 "schema": new_st.json(), "colmap": cmap,
                 "actions": []}
        _mark_feature(entry, snap, "column-mapping")
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"rename_column lost the snapshot race under {root}")


def drop_column(root: str, name: str, max_retries: int = 5,
                checkpoint_every: int = 10) -> int:
    """DROP COLUMN as ONE metadata commit — zero bytes rewritten:
    the logical schema loses the field, the column's PHYSICAL name
    is tombstoned in ``phys_dropped`` (so a later schema evolution
    re-adding the same name maps to a FRESH physical and the old
    bytes never resurrect), and readers simply stop projecting it.
    The data remains on disk until the files are next rewritten
    (merge/DML/OPTIMIZE) — the Delta column-mapping DROP contract.
    Same refusals as rename: partition columns and
    constraint-referenced columns."""
    from pyspark.sql.types import StructType

    for _ in range(max_retries):
        snap = snapshot(root)
        if not snap.get("schema"):
            raise ValueError(
                f"drop_column: no recorded schema under {root}")
        st = StructType.fromJson(json.loads(snap["schema"]))
        names = [f.name for f in st.fields]
        if name not in names:
            raise ValueError(f"drop_column: no column {name!r} "
                             f"(have {names})")
        if len(names) == 1:
            raise ValueError("drop_column: cannot drop the last "
                             "column")
        if name in (snap.get("partition_by") or []):
            raise ValueError(
                f"drop_column: {name!r} is a partition column — "
                f"re-partition with overwrite")
        for cname, expr in (snap.get("constraints") or {}).items():
            if re.search(rf"\b{re.escape(name)}\b", expr):
                raise ValueError(
                    f"drop_column: constraint {cname!r} references "
                    f"{name!r}; drop it first")
        for gname, gexpr in (snap.get("generated") or {}).items():
            if gname != name and re.search(
                    rf"\b{re.escape(name)}\b", gexpr):
                raise ValueError(
                    f"drop_column: {name!r} feeds the generated "
                    f"column {gname!r}; drop that first")
        cmap = dict(snap.get("colmap") or {})
        phys = cmap.pop(name, name)
        dropped = list(snap.get("phys_dropped", []))
        if phys not in dropped:
            dropped.append(phys)
        new_st = StructType([f for f in st.fields
                             if f.name != name])
        entry = {"op": "drop-column", "ts": time.time(),
                 "name": name, "schema": new_st.json(),
                 "colmap": cmap, "phys_dropped": dropped,
                 "actions": []}
        _mark_feature(entry, snap, "column-mapping")
        gen = snap.get("generated") or {}
        if name in gen:
            entry["generated"] = {k: v for k, v in gen.items()
                                  if k != name}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"drop_column lost the snapshot race under {root}")


def append(df: DataFrame, root: str, max_retries: int = 20,
           checkpoint_every: int = 10,
           merge_schema: bool = False,
           partition_by: list[str] | None = None,
           generated: dict[str, str] | None = None) -> int:
    """Transactionally append ``df``. An append's actions reference
    only its OWN new files, so it serializes after any concurrent
    commit without semantic conflict (append-after-overwrite simply
    adds to the replaced table — the log order IS the serial order);
    losing the version race therefore always just retries at the
    next number.

    SCHEMA ENFORCEMENT (Delta-paper contract): the first commit
    records the table schema; later appends must match it exactly
    or pass ``merge_schema=True`` to evolve (add columns — type
    changes always refuse). The evolved schema rides the commit and
    read() projects every file through it, so old files surface
    NULL for new columns.

    PARTITIONED LAYOUT (r11): ``partition_by`` on the CREATING
    append records the spec in the log (like schema); data lands
    under hive-style ``col=value`` directories and every add action
    carries its exact partition values for pruning. Later appends
    INHERIT the recorded spec (passing a different one refuses);
    re-partitioning an existing table is an overwrite-only
    operation — directory layout is physical, not per-commit.

    GENERATED COLUMNS (r11 third stint, Delta's GENERATED ALWAYS
    AS): ``generated={col: expr}`` on the CREATING append records
    the spec like constraints; every write path computes a column
    the incoming frame omits and VALIDATES one it provides
    (null-safe equality — a contradicting value refuses). Composes
    with partitioning: ``partition_by`` a generated date/bucket
    column and writers supply only the base columns."""
    os.makedirs(root, exist_ok=True)
    snap0 = snapshot(root)
    recorded_pb = snap0.get("partition_by") or []
    # "creating" for the data layout = no schema recorded yet —
    # fileless property commits (set_bloom_index, constraints) may
    # legitimately precede the first data append
    creating = snap0.get("schema") is None and not snap0["files"]
    gen = dict(generated or {}) if creating \
        else dict(snap0.get("generated") or {})
    if not creating and generated is not None and \
            dict(generated) != gen:
        raise ValueError(
            f"table under {root} records generated columns {gen}; "
            f"an append cannot change them")
    df = _apply_generated(df, gen)
    if creating:
        spec = list(partition_by or [])
    else:
        if partition_by is not None and list(partition_by) != recorded_pb:
            raise ValueError(
                f"table under {root} is partitioned by {recorded_pb}; "
                f"an append cannot change the layout to "
                f"{list(partition_by)} — use overwrite to re-partition")
        spec = recorded_pb
    rec = _schema_check(df, snap0.get("schema"), merge_schema)
    _check_constraints(df, snap0.get("constraints", {}))
    new_cmap = _evolved_colmap(snap0, rec)
    eff_cmap = (new_cmap if new_cmap is not None
                else snap0.get("colmap"))
    adds = _stage_write(df, root, spec, eff_cmap,
                        snap0.get("bloom"))
    entry = {"op": "append", "ts": time.time(),
             "actions": [{"add": a} for a in adds]}
    if rec is not None:
        entry["schema"] = rec
    if new_cmap is not None:
        entry["colmap"] = new_cmap
        _mark_feature(entry, snap0, "column-mapping")
    if creating and spec:
        entry["partition_by"] = spec
    if creating and gen:
        entry["generated"] = gen
        _mark_feature(entry, snap0, "generated-columns")
    for _ in range(max_retries):
        head = _list_versions(root)
        v = (head[-1] if head else 0) + 1
        if _try_commit(root, v, entry):
            _maybe_checkpoint(root, v, checkpoint_every)
            return v
    raise CommitConflict(f"append lost the version race "
                         f"{max_retries} times under {root}")


def append_sliced(df: DataFrame, root: str, slice_expr: str,
                  n_slices: int, max_retries: int = 20,
                  checkpoint_every: int = 10) -> list[int]:
    """Land ``n_slices`` append COMMITS from ONE distributed write
    (r15) — the multi-batch ingest shape (Delta's multi-batch txn):
    ``df`` stages once, hive-partitioned by the integer
    ``slice_expr``, and each slice's files commit as their own
    version in slice order. Bit-equivalent on EVERY snapshot to

        for s in range(n_slices):
            append(df.where(slice_expr == s), root, ...)

    — the s-th new version holds exactly the slice-s rows, the
    first commit records the schema — but one scan and one write
    job replace n_slices of each. At 100 TB, landing a day's K
    ingest batches through one staging pass instead of K sequential
    jobs is the difference between one cluster occupancy and K.

    Restrictions (ValueError, use append()): the table must record
    no partition spec / column mapping / generated columns /
    constraints / bloom index — this primitive serves the plain
    bulk-ingest shape. ``slice_expr`` must be non-NULL and land in
    [0, n_slices) for every row (a row that would silently vanish
    raises instead — append().where() semantics would drop it)."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    os.makedirs(root, exist_ok=True)
    snap0 = snapshot(root)
    for blocker in ("partition_by", "colmap", "generated",
                    "constraints", "bloom"):
        if snap0.get(blocker):
            raise ValueError(
                f"append_sliced: table under {root} records "
                f"{blocker}; use append()")
    rec = _schema_check(df, snap0.get("schema"), False)
    sl = "__txlog_slice"
    stage = os.path.join(root, f"_stage-{uuid.uuid4().hex}")
    (df.withColumn(sl, F.expr(slice_expr).cast("int"))
       .write.mode("overwrite").partitionBy(sl).parquet(stage))
    by_slice: dict[int, list[dict]] = {s: [] for s in range(n_slices)}
    try:
        for dirpath, _dirs, files in sorted(os.walk(stage)):
            rel = os.path.relpath(dirpath, stage)
            pfs = [f for f in sorted(files) if f.endswith(".parquet")]
            if not pfs:
                continue
            if rel == "." or not rel.startswith(f"{sl}="):
                raise ValueError(
                    f"append_sliced: unexpected staged dir {rel!r}")
            tok = rel.split("=", 1)[1]
            try:
                s = int(tok)
            except ValueError:
                s = -1
            if s not in by_slice:
                raise ValueError(
                    f"append_sliced: slice value {tok!r} outside "
                    f"[0, {n_slices}) — every row must land in a "
                    f"declared slice")
            for f in pfs:
                src = os.path.join(dirpath, f)
                n_rows = pq.ParquetFile(src).metadata.num_rows
                if n_rows == 0:
                    continue
                name = f"part-{uuid.uuid4().hex}.parquet"
                dst = os.path.join(root, name)
                os.replace(src, dst)
                by_slice[s].append(
                    {"path": name, "bytes": os.path.getsize(dst),
                     "rows": n_rows, "stats": _footer_stats(dst),
                     "nulls": _footer_nulls(dst)})
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    versions: list[int] = []
    for s in range(n_slices):
        entry = {"op": "append", "ts": time.time(),
                 "actions": [{"add": a} for a in by_slice[s]]}
        if rec is not None and not versions:
            entry["schema"] = rec
        committed = False
        for _ in range(max_retries):
            head = _list_versions(root)
            v = (head[-1] if head else 0) + 1
            if _try_commit(root, v, entry):
                _maybe_checkpoint(root, v, checkpoint_every)
                versions.append(v)
                committed = True
                break
        if not committed:
            raise CommitConflict(
                f"append_sliced lost the version race "
                f"{max_retries} times under {root}")
    return versions


def overwrite(df: DataFrame, root: str, expected_version: int | None = None,
              max_retries: int = 20, checkpoint_every: int = 10,
              partition_by: list[str] | None = None,
              generated: dict[str, str] | None = None) -> int:
    """Transactionally replace the table's contents. If
    ``expected_version`` is given, the overwrite only commits if the
    head is still that version (compare-and-swap semantics — the
    caller's read-modify-write is rejected with CommitConflict if
    anyone committed in between); otherwise it removes whatever the
    head holds at commit time, retrying the snapshot on a lost
    race.

    CHECK constraints survive a full replace (they are table
    metadata, not data), so the overwrite validates the NEW data
    against them (ADVICE r10: the r10 version skipped this, letting
    a replace land rows every subsequent append would then trip
    over). A constraint referencing a column the replacement schema
    drops fails analysis — drop the constraint first; silent
    unenforcement would be worse.

    An overwrite RESETS the partition layout the way it resets the
    schema: pass ``partition_by`` to (re-)partition, omit it for an
    unpartitioned replacement — full-replace is the one op where a
    layout change can't strand old files behind the recorded spec
    (they are all removed in the same commit)."""
    os.makedirs(root, exist_ok=True)
    spec = list(partition_by or [])
    gen = dict(generated or {})
    df = _apply_generated(df, gen)
    snap0 = snapshot(root)
    _check_constraints(df, snap0.get("constraints", {}))
    # bloom spec is a table PROPERTY (like constraints): it
    # survives a full replace and indexes the new files
    adds = _stage_write(df, root, spec, None, snap0.get("bloom"))
    for _ in range(max_retries):
        snap = snapshot(root)
        if expected_version is not None and \
                snap["version"] != expected_version:
            raise CommitConflict(
                f"table at version {snap['version']}, "
                f"expected {expected_version}")
        entry = {"op": "overwrite", "ts": time.time(),
                 "actions": ([{"remove": {"path": p}}
                              for p in sorted(snap["files"])]
                             + [{"add": a} for a in adds]),
                 # an overwrite REPLACES the table: its schema is
                 # simply the new data's schema (full-replace is
                 # the one op where divergence can't strand old
                 # files behind the recorded schema); the partition
                 # spec resets the same way
                 "schema": _schema_check(df, None, False),
                 "partition_by": spec,
                 # full-replace resets the column mapping (and the
                 # generated-column spec) the way it resets the
                 # schema: the new files are written
                 # logical==physical and the old (possibly mapped)
                 # files are all removed in the same commit
                 "colmap": {}, "phys_dropped": [],
                 "generated": gen}
        if gen:
            _mark_feature(entry, snap, "generated-columns")
        if _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(f"overwrite lost the version race "
                         f"{max_retries} times under {root}")


def read(spark, root: str, version: int | None = None,
         as_of: float | None = None) -> DataFrame:
    """Snapshot-isolated read (optionally time-traveled): resolve
    the live file list as of ``version`` and read exactly those
    parquet files — commits after resolution are invisible to this
    DataFrame. When the log carries a recorded schema (every table
    written since schema tracking), the read projects through the
    schema AS OF that version — files predating an evolved column
    surface NULL for it, and time travel returns the old shape.

    ``as_of`` (r11) is TIMESTAMP AS OF: unix seconds resolved to
    the newest version committed at or before that instant
    (version_at); mutually exclusive with ``version``.

    Deletion vectors apply transparently (via _read_files): a file
    carrying a ``dv`` ref surfaces only its undeleted rows, and
    time travel to a pre-delete version resolves the original add
    action — no vector, all rows."""
    from pyspark.sql.types import StructType

    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= OR as_of=, not both")
        version = version_at(root, as_of)
    snap = snapshot(root, version)
    if not snap["files"]:
        if snap.get("schema"):
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(snap["schema"])))
        return spark.createDataFrame([], "placeholder string") \
            .limit(0).drop("placeholder")
    return _read_files(spark, root, snap, sorted(snap["files"]))


# Max boolean columns per membership-aggregate pass (the FALLBACK
# path for huge distinct-key sets). A million-file table runs
# ceil(n_files / batch) bounded-width aggregates over the (cached)
# distinct update keys instead of one pathologically wide plan
# (VERDICT r9 What's-wrong #3). Kept small: Catalyst analysis +
# codegen of the aggregate grow superlinearly in expression count —
# a 1024-column pass measured ~20 s of pure planning at 1000 files
# (PLANS.md r10), a 128-column pass stays in the planner's
# comfortable range.
_STAT_AGG_BATCH = 128

# Distinct update keys up to this bound collect to the driver and
# the file-range membership test runs as sorted-keys bisect per
# file — n_files * log(n_keys) C-level compares, type-exact
# (Python ints never round through float64, unlike a numpy
# searchsorted), and ZERO Spark jobs per file batch. A daily 0.1%
# upsert's key set fits comfortably; beyond the bound the batched
# distributed aggregate takes over. Tests set 0 to force the
# fallback.
_KEY_COLLECT_BOUND = 2_000_000

# The row bound alone is blind to key WIDTH (VERDICT r11 #5): 2M
# 500-byte strings is a ~1 GB driver bill where 2M ints is ~60 MB.
# The collect is additionally capped by ESTIMATED BYTES — row count
# x (sampled average key length + per-object Python overhead for
# strings; a flat 32 B for fixed-width types). 64 MB keeps the
# 2M-int behavior exactly while wide string keys fall back to the
# distributed aggregate at the row count their width earns.
_KEY_COLLECT_BYTES = 64 * 1024 * 1024
_KEY_PYOBJ_OVERHEAD = 56  # CPython str header + list slot, approx


def _key_collect_ok(n_keys: int, est_bytes: float) -> bool:
    """May the merge fast path collect this key set to the driver?
    Factored for tests to observe the regime decision."""
    return (n_keys <= _KEY_COLLECT_BOUND
            and est_bytes <= _KEY_COLLECT_BYTES)


def _key_stat_domain(kdf, dt: str):
    """(kdf, dt) with the ``_k`` key column cast to the STAT domain
    its column's file-side metadata lives in:

    - date -> ISO string (the partition-token domain; cast gives
      'YYYY-MM-DD' and code-point order IS date order). Without it
      datetime.date keys bisect against string stats and raise
      TypeError (ADVICE r14 high).
    - timestamp -> the UTC-normalized 'T'-form token domain
      (_utc_token), rendered with date_format under a UTC session
      ONLY — any other session renders wall time in the wrong zone,
      so the keys stay raw there (conservative: bisect's TypeError
      guard and the digest's domain guard keep them inert).
    - everything else: unchanged."""
    from pyspark.sql import functions as F

    if dt == "date":
        return (kdf.select(F.col("_k").cast("string").alias("_k")),
                "string")
    if dt == "timestamp" and kdf.sparkSession.conf.get(
            "spark.sql.session.timeZone", "") == "UTC":
        return (kdf.select(F.regexp_replace(
            F.date_format("_k", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
            "\\.000000$", "").alias("_k")), "string")
    return kdf, dt


# Value-range bucket count for the over-collect-gate key digest.
# 2^18 buckets = a 256 KB bitmap per key column — broadcastable,
# with bucket resolution fine enough that a clustered 5M-key upsert
# still prunes to its key range's files.
_KEY_DIGEST_BUCKETS = 1 << 18


class _KeyDigest:
    """Bounded digest of a merge's distinct keys for ONE column —
    the over-collect-gate regime (VERDICT r13 #4): when the
    distinct key set exceeds the collect gate, executors test each
    file's [lo, hi] against a VALUE-RANGE bucket bitmap instead of
    the driver falling back to O(files) batched aggregates.

    Construction: a MONOTONE projection to float64 (identity for
    numbers; big-endian first-8-bytes for strings — truncation +
    zero-pad preserves code-point order, and UTF-8 byte order IS
    code-point order) -> equal-width buckets over [pmin, pmax] ->
    a bucket is marked when >= 1 distinct key projects into it.
    The bucket formula is the SAME IEEE-754 double expression on
    both sides (Spark JVM at build, Python at test), so the grids
    agree exactly.

    may_intersect() is conservative by construction: monotonicity
    puts every key of [lo, hi] inside the tested bucket span, a
    marked bucket only proves some key lands in it, and any domain
    mismatch or projection failure answers True (touch)."""

    __slots__ = ("kind", "kmin", "kmax", "pmin", "pmax", "w",
                 "bits", "has_nan", "empty", "enc_exact")

    def __init__(self, kind, kmin, kmax, pmin, pmax, w, bits,
                 has_nan, empty=False, enc_exact=True):
        self.kind = kind        # "num" | "str"
        # str kind: kmin/kmax live in the UTF-8 BINARY domain
        # (bytes), whose unsigned lexicographic order IS code-point
        # order on both sides — Spark F.min/F.max over raw strings
        # uses UTF-16 code-unit order, which disagrees with
        # Python/parquet for supplementary-plane chars mixed with
        # U+E000..U+FFFF (ADVICE r15 medium)
        self.kmin, self.kmax = kmin, kmax
        self.pmin, self.pmax, self.w = pmin, pmax, w
        self.bits = bits        # np bool array, _KEY_DIGEST_BUCKETS
        self.has_nan = has_nan
        self.empty = empty
        # False when some key does not round-trip through UTF-8
        # (lone surrogates): Spark's encode() replaces those with
        # '?' so the byte domain stops being monotone — the str
        # coarse/bucket tests then answer True unconditionally
        self.enc_exact = enc_exact

    @staticmethod
    def _proj_str(s: str):
        try:
            b = s.encode("utf-8")[:8]
        except UnicodeEncodeError:
            return None  # lone surrogate in a stat: incomparable
        return float(int.from_bytes(b.ljust(8, b"\0"), "big"))

    def _proj(self, v):
        if self.kind == "str":
            return self._proj_str(v) if isinstance(v, str) else None
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        try:
            return float(v)
        except OverflowError:
            return None

    def may_intersect(self, lo, hi) -> bool:
        if self.empty:
            return False  # zero non-null keys: nothing matches
        if (isinstance(lo, str) != (self.kind == "str")
                or isinstance(hi, str) != (self.kind == "str")):
            return True  # stat/digest domain mismatch: cannot skip
        if self.kind == "str":
            # Coarse-compare strings in the UTF-8 BINARY domain:
            # kmin/kmax are Spark min/max over encode(_k, 'utf-8')
            # (unsigned byte order == code-point order on both
            # sides — full precision, so shared-prefix key spaces
            # like date tokens still exclude), guarded by the
            # round-trip flag (ADVICE r15 medium).
            if not self.enc_exact:
                return True
            try:
                lo_b = lo.encode("utf-8")
                hi_b = hi.encode("utf-8")
            except UnicodeEncodeError:
                return True  # surrogate-bearing stat: incomparable
            if hi_b < self.kmin or lo_b > self.kmax:
                return False
        else:
            try:
                if hi < self.kmin or lo > self.kmax:
                    return False
            except TypeError:
                return True
        plo, phi = self._proj(lo), self._proj(hi)
        if plo is None or phi is None or self.w == 0.0:
            return True  # single-bucket digest: coarse test decided
        nb = len(self.bits)
        b0 = max(0, min(int(math.floor((plo - self.pmin) / self.w)),
                        nb - 1))
        b1 = max(0, min(int(math.floor((phi - self.pmin) / self.w)),
                        nb - 1))
        if b1 < b0:
            return True
        return bool(self.bits[b0:b1 + 1].any())


def _key_digest(updates: DataFrame, key: str) -> "_KeyDigest | None":
    """Build the over-gate digest for one key column in THREE
    bounded Spark jobs (min/max/has-NaN agg + distinct-bucket
    collect), never collecting the keys themselves. Returns None
    for domains without a monotone projection (exotic types) —
    the caller's legacy fallback stands."""
    import numpy as np
    from pyspark.sql import functions as F

    dt = updates.schema[key].dataType.simpleString()
    kdf = updates.select(F.col(key).alias("_k")) \
        .where(F.col("_k").isNotNull())
    # digest in the stat domain (date/timestamp -> ISO tokens)
    kdf, dt = _key_stat_domain(kdf, dt)
    is_float = dt in ("float", "double")
    if dt in ("tinyint", "smallint", "int", "bigint", "float",
              "double"):
        kind = "num"
        proj = F.col("_k").cast("double")
        if is_float:
            kdf = kdf.where(~F.isnan(F.col("_k")))
    elif dt == "string":
        kind = "str"
        # big-endian first-8-bytes as uint64: rpad keeps short
        # strings left-aligned (matching the Python-side zero-pad),
        # conv(hex, 16, 10) is unsigned, the double cast is
        # monotone
        proj = F.expr(
            "cast(conv(hex(substring(rpad(encode(_k, 'utf-8'), 8,"
            " x'00'), 1, 8)), 16, 10) as double)")
    else:
        return None
    has_nan = False
    if is_float:
        row = updates.select(F.col(key).alias("_k")) \
            .where(F.col("_k").isNotNull()) \
            .agg(F.max(F.isnan(F.col("_k")))).collect()[0]
        has_nan = bool(row[0])
    enc_exact = True
    if kind == "str":
        # kmin/kmax in the UTF-8 BINARY domain: Spark orders binary
        # by unsigned bytes, which equals Python/parquet code-point
        # order — raw-string F.min/F.max would use UTF-16 code-unit
        # order and can disagree (ADVICE r15 medium). The same
        # aggregate carries the round-trip flag: encode() replaces
        # lone surrogates with '?', so any non-round-tripping key
        # invalidates the byte domain (may_intersect answers True).
        kdf = kdf.select(
            F.encode(F.col("_k"), "utf-8").alias("_kb"),
            proj.alias("_p"),
            (F.col("_k") != F.decode(
                F.encode(F.col("_k"), "utf-8"), "utf-8"))
            .alias("_bad"))
        row = kdf.agg(F.min("_kb"), F.max("_kb"),
                      F.min("_p"), F.max("_p"),
                      F.max("_bad")).collect()[0]
        kmin, kmax, pmin, pmax, any_bad = row
        enc_exact = not bool(any_bad)
        if kmin is not None:
            kmin, kmax = bytes(kmin), bytes(kmax)
    else:
        kdf = kdf.select(F.col("_k"), proj.alias("_p"))
        row = kdf.agg(F.min("_k"), F.max("_k"),
                      F.min("_p"), F.max("_p")).collect()[0]
        kmin, kmax, pmin, pmax = row
    if kmin is None:
        return _KeyDigest(kind, None, None, 0.0, 0.0, 0.0, None,
                          has_nan, empty=True)
    pmin, pmax = float(pmin), float(pmax)
    nb = _KEY_DIGEST_BUCKETS
    w = (pmax - pmin) / nb
    bits = np.zeros(nb, dtype=bool)
    if w == 0.0:
        bits[0] = True
        return _KeyDigest(kind, kmin, kmax, pmin, pmax, 0.0, bits,
                          has_nan, enc_exact=enc_exact)
    # the SAME double expression the Python-side test evaluates:
    # floor((p - pmin) / w), clamped
    bucket = F.least(
        F.lit(nb - 1), F.greatest(F.lit(0), F.floor(
            (F.col("_p") - F.lit(pmin)) / F.lit(w)).cast("int")))
    ids = kdf.select(bucket.alias("_b")).distinct().collect()
    bits[[r[0] for r in ids]] = True
    return _KeyDigest(kind, kmin, kmax, pmin, pmax, w, bits,
                      has_nan, enc_exact=enc_exact)


def _collectable_keys(updates: DataFrame, key: str):
    """(sorted non-NaN key list, has_nan) when the distinct key set
    passes the collect gate (_key_collect_ok: row count AND
    estimated bytes), else (None, has_nan_unknown=False). Factored
    from _files_touching_keys_col so the distributed merge-prune
    job can ship the same bounded list."""
    from pyspark.sql import functions as F

    ks_df = updates.select(F.col(key).alias("_k")).distinct()
    dt = updates.schema[key].dataType.simpleString()
    # collect keys in the domain the stats live in (date/timestamp
    # -> ISO token strings; ADVICE r14 high / VERDICT r13 #5)
    ks_df, dt = _key_stat_domain(ks_df, dt)
    if dt in ("string", "binary"):
        row = ks_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("_k")).alias("w")).collect()[0]
        n_keys = row["n"]
        est_bytes = n_keys * ((row["w"] or 0.0)
                              + _KEY_PYOBJ_OVERHEAD)
    else:
        n_keys = ks_df.count()
        est_bytes = n_keys * 32
    if not _key_collect_ok(n_keys, est_bytes):
        return None, False
    ks = [r[0] for r in ks_df.collect() if r[0] is not None]
    has_nan = (dt in ("float", "double")
               and any(k != k for k in ks))
    return sorted(k for k in ks if k == k), has_nan


def _merge_touch_test(m: dict, col_tests: list[tuple],
                      root_abs: str | None, basename: str,
                      types: dict | None = None,
                      inv: dict | None = None) -> bool:
    """ONE file's conjunctive merge-touch test — shared by the
    distributed checkpoint job and the driver suffix loop.
    ``col_tests`` = [(key, phys_key, sorted_keys, has_nan,
    is_float, blooming)]: the file is touched only if EVERY key
    column's footer range intersects some update key (missing
    stats / NaN float keys conservatively pass; bloom refinement
    can still prove a range-hit absent). ``types``/``inv`` turn on
    the EFFECTIVE-stats view (partition tokens as exact [v, v]
    ranges, physical->logical re-keying) so partitioned and
    column-mapped tables prune identically to the driver's
    materialized view."""
    import bisect

    stats = (_effective_stats(m, types, inv)
             if types is not None or inv is not None
             else m.get("stats", {}))
    for key, pcol, ks, has_nan, is_float, blooming in col_tests:
        st = stats.get(key)
        if st is None:
            continue  # no stat: this column can't exclude
        if is_float and has_nan:
            continue  # NaN update key matches invisibly: pass
        lo, hi = st
        if isinstance(ks, _KeyDigest):
            # over-collect-gate regime (VERDICT r13 #4): the key
            # set never collected — test the file range against
            # the bucket bitmap; no key values, so bloom
            # refinement is unavailable for this column
            if not ks.may_intersect(lo, hi):
                return False
            continue
        try:
            i = bisect.bisect_left(ks, lo)
            if not (i < len(ks) and ks[i] <= hi):
                return False  # range proves no key in this file
        except TypeError:
            continue  # stat/key type mismatch: cannot exclude
        if blooming and root_abs is not None and "bloom" in m:
            j = bisect.bisect_right(ks, hi)
            in_range = ks[i:j]
            if len(in_range) <= _BLOOM_PROBE_BOUND:
                ent = _bloom_probe_entry(
                    root_abs, m["bloom"], basename, pcol)
                if ent is not None and not any(
                        _bloom_might_contain(ent, kv)
                        for kv in in_range):
                    return False
    return True


# Above this many coarse-surviving checkpoint rows the vectorized
# merge prune hands back to the Spark-job regime: the exact
# per-survivor re-verify (meta parse + bloom probes) is driver-side
# and must stay bounded.
_MERGE_VEC_SURVIVOR_BOUND = 100_000


def _merge_touch_vec(store: "_CpStore", col_tests: list[tuple],
                     root_abs: str | None,
                     types: dict | None, inv: dict | None):
    """IN-PROCESS vectorized merge touch test over a stats_parsed
    checkpoint (r14, the merge twin of _cp_vector_prune): numeric
    key columns evaluate as np.searchsorted (sorted-list regime) or
    a cumulative-sum bucket probe (digest regime) over the
    checkpoint's stat columns — no Spark job; the coarse survivors
    then re-verify through the EXACT per-file _merge_touch_test
    (which also covers string-keyed columns this pass skips, and
    bloom refinement, both bounded by the survivor count). Returns
    the touched checkpoint paths, or None when no numeric column is
    vectorizable / survivors exceed the re-verify bound (the
    Spark-job regime stands).

    Soundness: every compare rides a MONOTONE conversion (int64 ->
    float64 rounds to nearest but preserves order, and the digest's
    build-side projection is the same float64 grid), NULL stat
    cells conservatively fill with an always-hit range, and the
    final answer comes from the exact test — the vector pass can
    only over-keep, never over-prune."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not store.has_stats():
        return None

    def _excl_for(tbl):
        """(excl mask, usable) over ONE stats slice — the resident
        projection or one streamed row group."""
        names = set(tbl.schema.names)
        n = tbl.num_rows
        excl = None
        usable = False
        for key, pcol, ks, has_nan, is_float, _bl in col_tests:
            if is_float and has_nan:
                continue  # NaN update key matches invisibly
            lo, hi = _cp_eff_range(tbl, names, pcol, key,
                                   types or {})
            if lo is None or hi is None:
                continue
            if (pa.types.is_string(lo.type)
                    or pa.types.is_string(hi.type)):
                continue  # string stats: exact re-verify covers
            valid = pc.and_(pc.is_valid(lo), pc.is_valid(hi))
            valid_np = valid.combine_chunks().to_numpy(
                zero_copy_only=False)
            lo_np = pc.fill_null(lo, 0).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            hi_np = pc.fill_null(hi, 0).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            if lo_np.dtype.kind not in "if" \
                    or hi_np.dtype.kind not in "if":
                continue
            if isinstance(ks, _KeyDigest):
                if ks.kind != "num":
                    continue  # string digest: re-verify can't
                    # help either (no key values) — but other
                    # columns may
                if ks.empty:
                    c = valid_np.copy()  # zero keys: every stat-
                    excl = (c if excl is None  # bearing file
                            else (excl | c))  # provably untouched
                    usable = True
                    continue
                lo_f = lo_np.astype("float64")
                hi_f = hi_np.astype("float64")
                coarse = (hi_f < ks.kmin) | (lo_f > ks.kmax)
                if ks.w == 0.0:
                    c = valid_np & coarse
                else:
                    nb = len(ks.bits)
                    b0 = np.clip(np.floor(
                        (lo_f - ks.pmin) / ks.w).astype("int64"),
                        0, nb - 1)
                    b1 = np.clip(np.floor(
                        (hi_f - ks.pmin) / ks.w).astype("int64"),
                        0, nb - 1)
                    cs = np.concatenate(
                        ([0], np.cumsum(ks.bits, dtype="int64")))
                    no_key = (cs[b1 + 1] - cs[b0]) == 0
                    c = valid_np & (
                        coarse | (~coarse & (b1 >= b0) & no_key))
                excl = c if excl is None else (excl | c)
                usable = True
                continue
            # sorted-key-list regime
            if not ks:
                c = valid_np.copy()
                excl = c if excl is None else (excl | c)
                usable = True
                continue
            if isinstance(ks[0], str):
                continue  # string keys: exact re-verify covers
            ks_np = np.asarray(ks)
            if ks_np.dtype.kind not in "if":
                continue  # huge ints fell to object dtype: skip
            if len({ks_np.dtype.kind, lo_np.dtype.kind,
                    hi_np.dtype.kind}) > 1:
                # mixed int/float domains: exact only below 2**53
                cap = 2.0 ** 53
                vals = [np.abs(ks_np).max()]
                if valid_np.any():
                    vals.append(np.abs(lo_np[valid_np]).max())
                    vals.append(np.abs(hi_np[valid_np]).max())
                if max(float(v) for v in vals) >= cap:
                    continue
                ks_np = ks_np.astype("float64")
                lo_np = lo_np.astype("float64")
                hi_np = hi_np.astype("float64")
            idx = np.searchsorted(ks_np, lo_np, side="left")
            hit = np.zeros(n, dtype=bool)
            inb = idx < len(ks_np)
            hit[inb] = ks_np[idx[inb]] <= hi_np[inb]
            c = valid_np & ~hit
            excl = c if excl is None else (excl | c)
            usable = True
        return excl, usable

    # one pass, resident or streamed per row group (VERDICT r14
    # #1) — a slice with no usable column keeps all its rows
    keeps: list = []
    any_usable = False
    for _off, sl in store.stats_stream():
        excl, usable = _excl_for(sl)
        if usable:
            any_usable = True
            keeps.append(~excl)
        else:
            keeps.append(np.ones(sl.num_rows, dtype=bool))
    if not any_usable:
        return None
    keep = (keeps[0] if len(keeps) == 1
            else np.concatenate(keeps))
    n_keep = int(keep.sum())
    if n_keep > _MERGE_VEC_SURVIVOR_BOUND:
        return None  # unselective: the Spark-job regime scales
    if n_keep == 0:
        return []
    if store._tbl is not None:
        kept = store.table().select(["path", "meta"]) \
            .filter(pa.array(keep))
    else:
        import pyarrow.dataset as ds
        kept = ds.dataset(store.path).take(
            pa.array(np.flatnonzero(keep)),
            columns=["path", "meta"])
    out = []
    for p, mj in zip(kept.column("path").to_pylist(),
                     kept.column("meta").to_pylist()):
        if _merge_touch_test(json.loads(mj), col_tests, root_abs,
                             os.path.basename(p), types, inv):
            out.append(p)
    return out


# Diagnostic record of the LAST merge touch-test plan (VERDICT r14
# #7): which regime planned it ("vectorized" in-process stats pass /
# "spark-job" executor scan / "driver-loop" small-table or legacy
# fallback), per-key key-set regime ("keys" = collected sorted list,
# "digest" = over-gate value-range digest, "exotic" = no monotone
# projection -> legacy), and the survivor count. Read it after a
# merge/delete/update to see the plan shape of a slow 100-TB merge:
#     txlog.last_merge_plan()  ->  dict | None
_LAST_MERGE_PLAN: dict | None = None


def last_merge_plan() -> dict | None:
    """The most recent merge touch-test plan record:
    ``{"regime", "key_regimes", "survivors"}`` (see
    ``_LAST_MERGE_PLAN``). None before any merge planning ran."""
    return _LAST_MERGE_PLAN


def _files_touching_keys_dist(spark, files: "_LazyFiles",
                              updates: DataFrame, keys: list[str],
                              snap_root: str | None,
                              bloom_cols: set,
                              colmap: dict,
                              types: dict | None = None,
                              inv: dict | None = None
                              ) -> list[str] | None:
    """Distributed merge-prune over a COLUMNAR checkpoint (r13):
    when the merge key sets pass the collect gate, ONE Spark job
    over the checkpoint parquet evaluates the conjunctive
    range+bloom touch test executor-side (key lists ship as a
    broadcast, sidecars read where the files live), and the driver
    evaluates only the log suffix — a bounded daily upsert against
    a million-file table plans O(touched + suffix) driver-side
    instead of parsing a million metas. Returns None when any key
    column's distinct set exceeds the collect gate (the caller's
    batched-aggregate regime takes over, honestly O(files))."""
    global _LAST_MERGE_PLAN
    key_regimes: dict[str, str] = {}
    col_tests: list[tuple] = []
    for k in keys:
        ks, has_nan = _collectable_keys(updates, k)
        if ks is None:
            # over the collect gate: ship a bounded VALUE-RANGE
            # digest instead of falling back to the O(files)
            # driver aggregates (VERDICT r13 #4); conservative-only
            # (a digest can over-touch, never under-touch)
            dg = _key_digest(updates, k)
            if dg is None:
                key_regimes[k] = "exotic"
                _LAST_MERGE_PLAN = {"regime": "driver-loop",
                                    "key_regimes": key_regimes,
                                    "survivors": None}
                return None  # exotic key domain: legacy fallback
            ks, has_nan = dg, dg.has_nan
        key_regimes[k] = ("digest" if isinstance(ks, _KeyDigest)
                          else "keys")
        dt = updates.schema[k].dataType.simpleString()
        col_tests.append((
            k, (colmap or {}).get(k, k), ks, has_nan,
            dt in ("float", "double"),
            k in (bloom_cols or ())
            and not isinstance(ks, _KeyDigest)))
    store = files._store
    root_abs = (os.path.abspath(snap_root)
                if snap_root is not None else None)
    ti, iv = ((dict(types) if types is not None else None),
              (dict(inv) if inv is not None else None))
    # stats_parsed fast path (r14): the touch test vectorizes
    # IN-PROCESS over the checkpoint's stat columns — no Spark job;
    # exact per-file re-verify bounded by the coarse survivors
    kept = (_merge_touch_vec(store, col_tests, root_abs, ti, iv)
            if _VECTOR_PRUNE else None)
    regime = "vectorized" if kept is not None else "spark-job"
    if kept is None:
        _ship_package(spark)
        b_tests = spark.sparkContext.broadcast(col_tests)

        def _scan(batches):
            import pandas as _pd
            tests = b_tests.value
            for pdf in batches:
                kp = []
                for p, mj in zip(pdf["path"], pdf["meta"]):
                    if _merge_touch_test(json.loads(mj), tests,
                                         root_abs,
                                         os.path.basename(p),
                                         ti, iv):
                        kp.append(p)
                yield _pd.DataFrame({"path": kp})

        rows = (spark.read.parquet(store.path)
                .select("path", "meta")  # stat cols stay columnar
                .mapInPandas(_scan, "path string").collect())
        b_tests.unpersist()
        kept = [r["path"] for r in rows]
    dead = files._removed | set(files._added)
    touched = [p for p in kept if p not in dead]
    touched.extend(
        p for p, m in files._added.items()
        if _merge_touch_test(m, col_tests, root_abs,
                             os.path.basename(p), ti, iv))
    _LAST_MERGE_PLAN = {"regime": regime,
                        "key_regimes": key_regimes,
                        "survivors": len(touched)}
    return sorted(touched)


def _files_touching_keys(spark, files: dict[str, dict], updates: DataFrame,
                         keys: str | list[str],
                         snap_root: str | None = None,
                         bloom_cols: set | None = None,
                         colmap: dict | None = None,
                         types: dict | None = None,
                         inv: dict | None = None) -> list[str]:
    """The live files that MAY hold a row matching some update row
    on the (possibly composite) ``keys`` — the conjunctive
    per-column intersection of the single-column tests: a row in
    file F matches update u only if EVERY key column agrees, so F
    is safely skippable as soon as ANY key column's footer range
    misses every distinct update value for that column. Each
    column's test is the bisect/aggregate machinery below
    (including its NaN guard); the sets intersect with
    short-circuit — an empty intersection stops probing further
    columns. Conservative in the composite direction by design:
    per-column ranges cannot see cross-column correlation, so a
    file may be touched even though no full composite key lands in
    it — never the reverse."""
    if isinstance(keys, str):
        keys = [keys]
    store = files._store if isinstance(files, _LazyFiles) else None
    if (spark is not None and store is not None
            and store.n > _DISTRIBUTED_PRUNE_BOUND):
        # columnar-checkpoint fast path (r13): one Spark job
        # evaluates the conjunctive touch test over the checkpoint
        # parquet; the driver sees O(touched + suffix). Falls
        # through to the per-column machinery when a key set
        # exceeds the collect gate. types/inv carry the effective-
        # stats view into the job, so partitioned and column-mapped
        # tables prune with their typed partition tokens too.
        dist = _files_touching_keys_dist(
            spark, files, updates, keys, snap_root,
            bloom_cols or set(), colmap or {}, types, inv)
        if dist is not None:
            return dist
    else:
        # small table / no columnar store: the per-column driver
        # machinery below is the plan (last_merge_plan() visibility)
        global _LAST_MERGE_PLAN
        _LAST_MERGE_PLAN = {"regime": "driver-loop",
                            "key_regimes": {k: "keys" for k in keys},
                            "survivors": None}
    if types is not None or inv is not None:
        # driver machinery consumes the materialized effective-
        # stats view (partition tokens as [v, v], logical keying) —
        # what the call sites built via _pruning_view before r13
        files = {p: {**m, "stats": _effective_stats(m, types or {},
                                                    inv)}
                 for p, m in files.items()}
    touched: set[str] | None = None
    for k in keys:
        t = set(_files_touching_keys_col(
            spark, files, updates, k,
            snap_root if k in (bloom_cols or ()) else None,
            phys_key=(colmap or {}).get(k, k)))
        touched = t if touched is None else (touched & t)
        if not touched:
            break
    return sorted(touched or ())


def _files_touching_keys_col(spark, files: dict[str, dict],
                             updates: DataFrame, key: str,
                             snap_root: str | None = None,
                             phys_key: str | None = None) -> list[str]:
    """The live files whose footer [min,max] range for ``key``
    intersects at least one update key — plus every file lacking a
    stat for ``key`` (conservative). Two regimes:

    - distinct keys <= ``_KEY_COLLECT_BOUND`` (the normal upsert):
      collect the sorted key list once and bisect each file's
      [lo, hi] against it — n_files * log(n_keys) C-level compares
      on the driver, type-exact (Python int compares never round a
      bigint through float64), zero Spark planning per file.
    - beyond the bound: distributed aggregates over the distinct
      keys (a boolean max per candidate file — map-side-combinable,
      zero key collect, zero join), batched ``_STAT_AGG_BATCH``
      file-columns per pass so a 100k-file table never builds a
      100k-column plan; the key set is cached across passes.

    The file LIST is log metadata and is already on the driver.

    NaN guard (ADVICE r9): parquet footer min/max EXCLUDES NaN, and
    in Spark ``NaN >= lo`` is false — so a range test can never
    select a file on behalf of a NaN update key, even though Spark
    JOIN keys treat NaN = NaN as equal (a NaN-keyed row in some file
    WOULD be replaced by a NaN-keyed update). When the updates
    contain a NaN key, every float-statted file is conservatively
    treated as touched (stat-less files already are)."""
    from pyspark.sql import functions as F

    touched = [p for p, m in files.items()
               if key not in m.get("stats", {})]
    ranged = [(p, m["stats"][key]) for p, m in files.items()
              if key in m.get("stats", {})]
    if not ranged:
        return touched
    keys = updates.select(F.col(key).alias("_k")).distinct()
    dt = updates.schema[key].dataType.simpleString()
    # normalize the key domain to the stats' (see _key_stat_domain;
    # ADVICE r14 high / VERDICT r13 #5). Covers BOTH regimes: the
    # collected bisect AND the distributed range aggregate below.
    keys, dt = _key_stat_domain(keys, dt)
    if dt == "timestamp":
        # non-UTC session: the keys could NOT normalize into the
        # UTC token domain. The bisect regime is guarded by its
        # TypeError catch, but the aggregate regime below would
        # feed the string stats to F.lit and Spark would cast them
        # as SESSION wall time — shifting the range and silently
        # under-touching (code-review r14). String-statted files
        # are conservatively touched instead.
        touched += [p for p, st in ranged if isinstance(st[0], str)]
        ranged = [(p, st) for p, st in ranged
                  if not isinstance(st[0], str)]
        if not ranged:
            return touched
    is_float = dt in ("float", "double")
    if dt in ("string", "binary"):
        # one job: count + sampled average width (bytes-aware
        # bound, VERDICT r11 #5)
        row = keys.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("_k")).alias("w")).collect()[0]
        n_keys = row["n"]
        est_bytes = n_keys * ((row["w"] or 0.0)
                              + _KEY_PYOBJ_OVERHEAD)
    else:
        n_keys = keys.count()
        est_bytes = n_keys * 32
    if _key_collect_ok(n_keys, est_bytes):
        # fast path: bounded key set -> driver bisect over the file
        # ranges (no per-batch Spark planning; the aggregate path
        # below measured ~20 s of pure Catalyst work per 1024-wide
        # pass at 1000 files)
        import bisect

        ks = [r[0] for r in keys.collect() if r[0] is not None]
        if is_float and any(k != k for k in ks):
            # NaN update key: footer stats exclude NaN but join
            # keys match NaN = NaN — conservatively touch every
            # stat-bearing file (ADVICE r9)
            return touched + [p for p, _rng in ranged]
        ks = sorted(k for k in ks if k == k)
        if not ks:
            return touched
        for p, (lo, hi) in ranged:
            try:
                i = bisect.bisect_left(ks, lo)
                hit = i < len(ks) and ks[i] <= hi
            except TypeError:
                # stat/key type mismatch (e.g. a stat domain this
                # code doesn't normalize yet): conservative touch,
                # mirroring _stat_excludes' guard
                touched.append(p)
                continue
            if hit:
                # BLOOM refinement (r11 third stint): the range says
                # "maybe" — on an indexed column, probe the file's
                # sidecar with the in-range update keys; a file whose
                # filter excludes ALL of them provably holds no
                # matching row (false positives only widen). A
                # scattered-key upsert on a hash-laid-out table drops
                # from "touch every range-overlapping file" to
                # ~keys + fpp x files. Bounded per file so a huge
                # key set never turns pruning into the scan.
                meta = files[p]
                if snap_root is not None and "bloom" in meta:
                    j = bisect.bisect_right(ks, hi)
                    in_range = ks[i:j]
                    if len(in_range) <= _BLOOM_PROBE_BOUND:
                        # sidecars key PHYSICAL names (ADVICE r11)
                        ent = _bloom_probe_entry(
                            snap_root, meta["bloom"],
                            os.path.basename(p), phys_key or key)
                        if ent is not None and not any(
                                _bloom_might_contain(ent, kv)
                                for kv in in_range):
                            continue
                touched.append(p)
        return touched
    if is_float:
        has_nan = keys.agg(
            F.max(F.isnan(F.col("_k")))).collect()[0][0]
        if has_nan:
            # every stat-bearing file of a float key may hide NaN
            # rows the range test can't see — touch them all; the
            # range test below runs on nothing.
            return touched + [p for p, _rng in ranged]
    n_batches = math.ceil(len(ranged) / _STAT_AGG_BATCH)
    if n_batches > 1:
        keys = keys.cache()
    try:
        for b in range(n_batches):
            chunk = ranged[b * _STAT_AGG_BATCH:(b + 1) * _STAT_AGG_BATCH]
            aggs = [F.max((F.col("_k") >= F.lit(lo))
                          & (F.col("_k") <= F.lit(hi))).alias(f"f{i}")
                    for i, (_p, (lo, hi)) in enumerate(chunk)]
            row = keys.agg(*aggs).collect()[0]
            touched += [chunk[i][0] for i in range(len(chunk)) if row[i]]
    finally:
        if n_batches > 1:
            keys.unpersist()
    return touched


# ---------------------------------------------------------------- #
# deletion vectors (merge-on-read deletes)
# ---------------------------------------------------------------- #

# Sidecar dirs live under <root>/_dv/dv-<uuid>/ as ordinary parquet
# (columns: file string, pos bigint) — "file" is the data file's
# BASENAME (globally unique by _stage_write's uuid naming), "pos"
# the PHYSICAL row index within it, exactly what Spark's
# _metadata.row_index reads back. The public Delta/Iceberg shape
# (Delta deletion vectors / Iceberg v2 positional delete files):
# a DELETE marks row positions in a small sidecar instead of
# rewriting the hit files — at 100 TB, deleting 0.1% of rows costs
# megabytes of sidecar, not terabytes of rewrite.
_DV_DIR = "_dv"

# Deleted-position sets at or below this many rows ride the
# apply-side anti-join as a BROADCAST (the common case — deletes
# are a sliver of the data); larger sets fall back to a shuffled
# anti-join AQE can still re-plan.
_DV_BROADCAST_BOUND = 2_000_000

# r15 optimization: when a dv commit's CUMULATIVE sidecar (new
# matches + carried old vectors — the exact row count is known from
# the per-file counts BEFORE anything is written) fits this bound,
# the positions are collected in one narrow Arrow job and the
# sidecar parquet is written driver-side — no repartition exchange,
# no distributed write job. The bound is exact, the collect is the
# same bounded-metadata class as the merge planner's survivor sets
# (~16 MB of (file, pos) rows per million positions). Past it the
# unchanged distributed write runs. 0 disables the local path.
_DV_LOCAL_POSITIONS = int(os.environ.get(
    "SPARK_GRAFT_DV_LOCAL_POSITIONS", str(4_000_000)))

# OPTIMIZE rewrites (purges) a dv-carrying file once this fraction
# of its physical rows is deleted — Delta's deletedRowsRatio rule.
_DV_PURGE_RATIO = 0.05

# Internal metadata column names (the __txlog_ prefix keeps them
# out of any realistic user schema, same convention as the DML
# match flag).
_DV_FILE = "__txlog_dv_file"
_DV_POS = "__txlog_dv_pos"


def _dv_refs(files_meta: dict, paths: list[str]) -> dict:
    """{data-file basename: dv meta} for the given paths that carry
    a deletion vector. Basenames are the join key everywhere: they
    are unique by construction and identical for relative paths,
    hive-partitioned paths, and a clone's absolute references."""
    out = {}
    for p in paths:
        m = files_meta.get(p) or {}
        if "dv" in m:
            out[os.path.basename(p)] = m["dv"]
    return out


def _dv_table(spark, root: str, refs: dict,
              for_join: bool = True) -> DataFrame:
    """The deleted-position set for ``refs`` as a (file, pos)
    DataFrame: union of the referenced sidecar dirs, restricted to
    the referenced basenames. A sidecar may carry positions for
    files whose CURRENT ref is a newer sidecar (each new vector is
    cumulative per file) — those rows are duplicates of a subset
    and an anti-join is insensitive to them, but the isin filter
    keeps the scan honest. Broadcast below _DV_BROADCAST_BOUND
    when the caller feeds a join (``for_join=False`` for union-side
    consumers — a hint under a union only logs a warning)."""
    from pyspark.sql import functions as F

    dirs = sorted({r["path"] for r in refs.values()})
    dv = (spark.read.parquet(*[os.path.join(root, d) for d in dirs])
          .where(F.col("file").isin(list(refs))))
    if for_join and sum(r.get("deleted", 0) for r in refs.values()) \
            <= _DV_BROADCAST_BOUND:
        dv = F.broadcast(dv)
    return dv


def _clean_non_parquet(d: str) -> None:
    """Strip committer litter (_SUCCESS, .crc) from a just-written
    sidecar dir so vacuum's walk sees parquet only."""
    for dirpath, _dirs, files in os.walk(d):
        for f in files:
            if not f.endswith(".parquet"):
                os.unlink(os.path.join(dirpath, f))


def _read_files(spark, root: str, snap: dict, paths: list[str],
                with_meta: bool = False) -> DataFrame:
    """Read specific live files THROUGH the snapshot's recorded
    schema — the same NULL-backfill projection read() applies, so a
    schema-evolved table's pre-evolution files surface NULL for
    evolved columns instead of handing back a first-file-wins shape
    (ADVICE r10). The schema/column-mapping/partition projection is
    _read_paths_at's (one copy — code-review r11); this wrapper
    layers the snapshot-specific parts on top:

    DELETION VECTORS apply here, once, for every consumer: a path
    whose add action carries a ``dv`` ref gets its deleted
    positions anti-joined away on (_metadata.file_name,
    _metadata.row_index) — so read/read_range/read_where see
    post-delete state, and every REWRITE path (merge, DML,
    optimize) naturally materializes the delete and drops the ref.
    Tables without vectors keep the exact pre-dv plan (no metadata
    columns, no join). ``with_meta=True`` returns the two
    _DV_FILE/_DV_POS columns for callers that need provenance
    (hit-file scans, the dv writer itself)."""
    refs = _dv_refs(snap["files"], paths)
    need_meta = bool(refs) or with_meta
    out = _read_paths_at(spark, root, paths, snap.get("schema"),
                         with_meta=need_meta,
                         colmap=snap.get("colmap"))
    if refs:
        dv = _dv_table(spark, root, refs)
        out = out.join(
            dv, (out[_DV_FILE] == dv["file"])
            & (out[_DV_POS] == dv["pos"]), "left_anti")
    if need_meta and not with_meta:
        out = out.drop(_DV_FILE, _DV_POS)
    return out


_MERGE_TARGET_BYTES = 128 * 1024 * 1024


def _size_merge_output(merged: DataFrame, snap: dict,
                       touched: list[str]) -> DataFrame:
    """Bound the FILE COUNT of a merge rewrite. The natural
    partitioning of (survivors UNION updates) is the union of both
    inputs' partitions — a 100-row daily upsert touching one file
    would otherwise land as ~33 near-empty parts (measured in the
    r11 probe: the second merge against the same table then
    'touches' all that debris, and every merge after compounds it —
    the tiny-file spiral OPTIMIZE exists to undo, created by the
    very op that should not create it). Rewrite as
    ceil(touched_bytes / 128 MB) files instead — the touched bytes
    are log metadata, already on the driver, and they bound the
    survivor volume; the repartition shuffle moves only the rows the
    merge already reads, i.e. the pruned set, never the table.

    On a PARTITIONED table the rewrite hashes on the partition
    columns (r11): a random repartition would scatter every
    partition's rows across all n bins and the partitioned writer
    would split each bin back out per value — up to n x partitions
    near-empty files from one rewrite. Hashing keeps each
    partition's rows in one task (collisions split out correctly
    at write time)."""
    from pyspark.sql import functions as F

    tb = sum(snap["files"][p].get("bytes", 0) for p in touched)
    n = max(1, math.ceil(tb / _MERGE_TARGET_BYTES))
    pb = snap.get("partition_by")
    if pb:
        return merged.repartition(n, *[F.col(c) for c in pb])
    return merged.repartition(n)


def merge_upsert(spark, root: str, updates: DataFrame,
                 key: str | list[str],
                 max_retries: int = 5, checkpoint_every: int = 10,
                 merge_schema: bool = False) -> int:
    """MERGE INTO (upsert) over the transaction log — B28's
    merge-upsert semantics running against the ACID table, at FILE
    granularity: the footer stats each add action carries prune the
    snapshot to the files whose ``key`` range intersects the update
    keys; ONLY those files are read, anti-joined, and rewritten
    together with the updates — every other file's add action (and
    its bytes on disk) carries into the new version verbatim,
    untouched and unopened. A daily upsert of 0.1% of keys on a
    100 TB table rewrites the files holding those keys, not the
    table (the r8 version rewrote everything — VERDICT r8
    What's-wrong #2).

    ``key`` may be a COLUMN LIST (r11): real upserts hit composite
    business keys — (customer, date), (source, doc_id) — and the
    match is the conjunction over all columns. Pruning generalizes
    conjunctively (see _files_touching_keys): a file skips as soon
    as any one key column's range misses the updates.

    Concurrency: the commit compare-and-swaps against the snapshot
    version read at the start; a commit that lands in between
    (append or overwrite) fails the CAS and the WHOLE merge re-runs
    on the fresh snapshot — the read-modify-write is serializable,
    never lost-update. Staged files from a failed attempt are
    unreferenced garbage vacuum() collects, never corruption.

    Diagnostics: ``last_merge_plan()`` reports which touch-test
    regime planned this merge (vectorized / spark-job /
    driver-loop), each key's key-set regime (collected keys vs
    over-gate digest), and the survivor count."""
    keys = [key] if isinstance(key, str) else list(key)
    os.makedirs(root, exist_ok=True)
    updates = _apply_generated(updates,
                               snapshot(root).get("generated") or {})
    for _ in range(max_retries):
        snap = snapshot(root)
        rec = None
        if snap.get("schema") is not None:
            # updates must match the table exactly, OR evolve it
            # ADDITIVELY with merge_schema=True (r11, Delta's
            # autoMerge-on-MERGE): new columns join the table,
            # survivors and untouched files surface NULL for them.
            # A NARROWER update is refused even under merge_schema —
            # the upsert replaces matched rows wholesale, so a
            # missing column would silently NULL matched rows' data
            rec = _schema_check(updates, snap["schema"], merge_schema)
            # the guard runs UNCONDITIONALLY (not only when rec
            # evolved): since r12's type widening, a pure narrower
            # write passes _schema_check with rec=None for
            # append-path semantics — but a merge must still refuse
            from pyspark.sql.types import StructType as _ST
            table_cols = {f.name for f in _ST.fromJson(
                json.loads(snap["schema"])).fields}
            narrower = table_cols - set(updates.columns)
            if narrower:
                raise SchemaMismatch(
                    f"merge_upsert updates lack table columns "
                    f"{sorted(narrower)}; an upsert replaces "
                    f"matched rows wholesale, so evolution may "
                    f"only ADD columns")
        _check_constraints(updates, snap.get("constraints", {}))
        touched = _files_touching_keys(
            spark, snap["files"], updates, keys, root,
            set((snap.get("bloom") or {}).get("cols", [])),
            colmap=snap.get("colmap"),
            types=(_schema_types(snap)
                   if snap.get("partition_by") else None),
            inv=_inv_colmap(snap)) \
            if snap["files"] else []
        if touched:
            cur = _read_files(spark, root, snap, touched)
            merged = _size_merge_output(
                cur.join(updates, keys, "left_anti")
                .unionByName(updates, allowMissingColumns=True),
                snap, touched)
        else:
            merged = updates
        new_cmap = _evolved_colmap(snap, rec)
        adds = _stage_write(merged, root, snap.get("partition_by"),
                            (new_cmap if new_cmap is not None
                             else snap.get("colmap")),
                            snap.get("bloom"))
        entry = {"op": "merge", "ts": time.time(),
                 "actions": ([{"remove": {"path": p}} for p in touched]
                             + [{"add": a} for a in adds])}
        if rec is not None:
            entry["schema"] = rec
        if new_cmap is not None:
            entry["colmap"] = new_cmap
            _mark_feature(entry, snap, "column-mapping")
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1, checkpoint_every)
            return snap["version"] + 1
        # lost the race: staged files become vacuumable garbage,
        # re-run the merge against the new head
    raise CommitConflict(
        f"merge_upsert lost the snapshot race {max_retries} times "
        f"under {root}")


def merge_delete(spark, root: str, keys_df: DataFrame,
                 key: str | list[str],
                 max_retries: int = 5, checkpoint_every: int = 10,
                 mode: str = "rewrite") -> int:
    """MERGE ... WHEN MATCHED THEN DELETE — the other half of the
    Delta MERGE contract (r11): every table row whose (possibly
    composite) ``key`` matches a row of ``keys_df`` is removed;
    unmatched source keys do nothing. Same FILE granularity as the
    upsert: footer-stat pruning finds the key-intersecting files,
    ONLY those are read and rewritten (survivors via left_anti);
    every other add action carries verbatim, unopened. Deleting
    nothing is a no-op that commits NO version (the table head is
    returned unchanged — an empty rewrite would churn the log).

    Commits as op="merge" (with a ``matched: delete`` marker for
    auditors), so the stream source's NonAppendChange and
    read_changes' apply-by-key contracts apply unchanged — with the
    standard CDF caveat stated honestly: a delete-merge's add files
    hold SURVIVORS only, so an apply-by-key consumer keeps the
    deleted keys' stale rows (row-level delete propagation needs
    row tracking; Delta's ignore_changes has the same caveat —
    run the delete in mode="dv" and read_changes_rows() emits the
    exact deleted rows instead).

    ``mode="dv"`` (r11): merge-on-read — matching rows' positions
    land in a deletion-vector sidecar and NO data file is
    rewritten, the same contract as delete_where(mode="dv"). The
    exactness is slightly TIGHTER than the rewrite path: dv mode
    scans the stat-plausible files once, so keys that prune as
    possible but match nothing commit NO version (the rewrite path
    rewrites such files verbatim and commits)."""
    from pyspark.sql import functions as F

    if mode not in ("rewrite", "dv"):
        raise ValueError(f"merge_delete mode={mode!r}: "
                         f"expected 'rewrite' or 'dv'")
    keys = [key] if isinstance(key, str) else list(key)
    for _ in range(max_retries):
        snap = snapshot(root)
        probe = keys_df.select(*keys).dropDuplicates(keys)
        touched = _files_touching_keys(
            spark, snap["files"], probe, keys, root,
            set((snap.get("bloom") or {}).get("cols", [])),
            colmap=snap.get("colmap"),
            types=(_schema_types(snap)
                   if snap.get("partition_by") else None),
            inv=_inv_colmap(snap)) \
            if snap["files"] else []
        if not touched:
            return snap["version"]  # provably nothing to delete
        if mode == "dv":
            base = _read_files(spark, root, snap, touched,
                               with_meta=True)
            # fused (r15): ONE left join against the (unique) probe
            # keys yields per-file live AND hit counts in a single
            # job — probe is deduplicated, so the join multiplies
            # nothing and a row matches iff the old left_semi
            # membership held (NULL keys never match either way)
            mark = f"__txlog_md_{uuid.uuid4().hex[:8]}"
            j = base.join(probe.withColumn(mark, F.lit(True)),
                          keys, "left")
            per_all = {r[0]: (r[1], r[2]) for r in
                       (j.groupBy(_DV_FILE)
                        .agg(F.count(F.lit(1)).alias("live"),
                             F.count(F.when(F.col(mark), F.lit(1)))
                             .alias("hit"))
                        .collect())}
            per_file = {n: (live, hit)
                        for n, (live, hit) in per_all.items() if hit}
            if not per_file:
                return snap["version"]  # plausible but no real hit
            real = [p for p in touched
                    if os.path.basename(p) in per_file]
            actions = _dv_mark_actions(spark, root, snap, real,
                                       j.where(F.col(mark)),
                                       per_file)
        else:
            survivors = _size_merge_output(
                _read_files(spark, root, snap, touched)
                .join(probe, keys, "left_anti"), snap, touched)
            adds = _stage_write(survivors, root,
                                snap.get("partition_by"),
                                snap.get("colmap"),
                                snap.get("bloom"))
            actions = ([{"remove": {"path": p}} for p in touched]
                       + [{"add": a} for a in adds])
        entry = {"op": "merge", "ts": time.time(), "matched": "delete",
                 "actions": actions}
        if mode == "dv":
            entry["mode"] = "dv"
            _mark_feature(entry, snap, "deletion-vectors")
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1, checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"merge_delete lost the snapshot race {max_retries} times "
        f"under {root}")


_CMP_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s*(<=|>=|==|=|<|>)\s*(.+?)\s*$")
_NULL_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s+IS\s+(NOT\s+)?NULL\s*$", re.IGNORECASE)
_CMP_REV_RE = re.compile(
    r"^\s*(.+?)\s*(<=|>=|==|=|<|>)\s*([A-Za-z_]\w*)\s*$")
_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=",
         "=": "=", "==": "="}


def _split_top_and(s: str) -> list[str]:
    """Split a SQL boolean expression on top-level ANDs only —
    quote- and paren-aware so ``a = 'x AND y' AND (b OR c)`` yields
    two conjuncts. Purely lexical; anything it mis-groups is still
    safe because unrecognized conjuncts simply contribute no
    pruning (see _parse_conjuncts)."""
    parts, depth, quoted, last, i = [], 0, False, 0, 0
    up = s.upper()
    while i < len(s):
        c = s[i]
        if quoted:
            if c == "'":
                quoted = False
        elif c == "'":
            quoted = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (depth == 0 and up.startswith("AND", i)
              and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
              and (i + 3 >= len(s)
                   or not (s[i + 3].isalnum() or s[i + 3] == "_"))):
            parts.append(s[last:i])
            last = i + 3
            i += 3
            continue
        i += 1
    parts.append(s[last:])
    return parts


def _split_top_or(s: str) -> list[str]:
    """_split_top_and's OR twin: split on top-level ORs only,
    quote- and paren-aware. SQL precedence holds for free — AND
    binds tighter, so splitting OR first groups ``a OR b AND c``
    as ``a`` | ``b AND c``."""
    parts, depth, quoted, last, i = [], 0, False, 0, 0
    up = s.upper()
    while i < len(s):
        c = s[i]
        if quoted:
            if c == "'":
                quoted = False
        elif c == "'":
            quoted = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (depth == 0 and up.startswith("OR", i)
              and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
              and (i + 2 >= len(s)
                   or not (s[i + 2].isalnum() or s[i + 2] == "_"))):
            parts.append(s[last:i])
            last = i + 2
            i += 2
            continue
        i += 1
    parts.append(s[last:])
    return parts


# Bounded DNF pruning (VERDICT r14 #5): past this many top-level
# disjuncts the predicate stops pruning (each disjunct costs one
# stats pass; 8 covers the multi-partition reload and z-order
# box-union shapes without letting a generated monster predicate
# turn planning O(disjuncts * files)).
_DNF_MAX_DISJUNCTS = 8


def _parse_dnf(condition: str, tz: str | None = None
               ) -> list[list[tuple]]:
    """The bounded-DNF data-skipping view of a predicate (VERDICT
    r14 #5): top-level OR disjuncts, each reduced to its recognized
    conjuncts by _parse_conjuncts. A file is skippable only when
    EVERY disjunct excludes it, so the survivor set is the UNION of
    per-disjunct survivor sets — conservative by construction.
    Returns [] (= no pruning) when any disjunct carries no
    recognized conjunct (that disjunct could match any file) or the
    disjunct count exceeds _DNF_MAX_DISJUNCTS. One disjunct
    degenerates to the classic conjunct list."""
    parts = _split_top_or(condition)
    if len(parts) == 1:
        conj = _parse_conjuncts(condition, tz)
        return [conj] if conj else []
    if len(parts) > _DNF_MAX_DISJUNCTS:
        return []
    out = []
    for p in parts:
        c = p.strip()
        while (c.startswith("(") and c.endswith(")")
               and _balanced(c[1:-1])):
            c = c[1:-1].strip()
        conj = _parse_conjuncts(c, tz)
        if not conj:
            return []
        out.append(conj)
    return out


def _files_matching_pred(snap: dict, condition: str,
                         root: str, spark,
                         tz: str | None = None) -> list[str] | None:
    """Survivor files for an arbitrary predicate through the
    bounded DNF: the union of _files_possibly_matching over the
    disjuncts (``ds='a' OR ds='b'`` plans exactly two partitions'
    files; a z-order box union prunes per box). None = the
    predicate has no prunable shape — scan everything."""
    dnf = _parse_dnf(condition, tz)
    if not dnf:
        return None
    keep: set[str] = set()
    for conj in dnf:
        keep.update(_files_possibly_matching(snap, conj, root,
                                             spark))
    return sorted(keep)


_TYPED_LIT_RE = re.compile(
    r"^(date|timestamp)\s*'([^']*)'$", re.IGNORECASE)


def _parse_literal(tok: str, tz: str | None = None):
    """A pruning-usable literal: int, FINITE float, a single-quoted
    string without embedded quotes, or (r14) a TYPED SQL literal —
    ``date '...'`` normalizes to its ISO string (the partition-
    token domain, always sound) and ``timestamp '...'`` to the
    UTC-normalized 'T'-form token ONLY when the caller supplies the
    session timezone ``tz`` (Spark evaluates the residual filter's
    literal as wall time in the session zone, so pruning must
    translate through the same zone; without it the conjunct is
    ignored). None means "not a literal we can reason about" — the
    conjunct is then ignored for pruning (never unsound; just no IO
    savings from it). Non-finite floats are refused because footer
    stats exclude NaN and clamp nothing to infinity."""
    m = _TYPED_LIT_RE.match(tok.strip())
    if m:
        kind, body = m.group(1).lower(), m.group(2)
        if kind == "date":
            import datetime as _dt
            try:
                return _dt.date.fromisoformat(body).isoformat()
            except ValueError:
                return None
        return _utc_token(body, tz) if tz else None
    if (len(tok) >= 2 and tok.startswith("'") and tok.endswith("'")
            and "'" not in tok[1:-1]):
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        v = float(tok)
        return v if math.isfinite(v) else None
    except ValueError:
        return None


# ------------------------------------------------------------------ #
# arrow-side generated-column expressions (r14, VERDICT r13 #6)
# ------------------------------------------------------------------ #

_EXPR_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)|(?P<str>'[^']*')"
    r"|(?P<id>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op><=|>=|==|!=|<>|[-+*/%()=<>,]))")

_EXPR_KEYWORDS = {"CASE", "WHEN", "THEN", "ELSE", "END", "CAST",
                  "AS", "AND", "OR"}


def _arrow_expr_compile(expr: str, types: dict):
    """Compile a generated-column expression into a pyarrow-compute
    evaluator over one record batch, or None when ANY part falls
    outside the PROVEN grammar (the caller keeps its refusal — a
    silently wrong value would be worse than no native path).

    Grammar (case-insensitive keywords):
      expr  := term (('+'|'-') term)*
      term  := unary (('*'|'/'|'%') unary)*
      unary := '-' unary | atom
      atom  := number | 'string' | column | '(' expr ')'
             | CAST '(' expr AS int|bigint|long|double|string ')'
             | CASE (WHEN cond THEN expr)+ (ELSE expr)? END
      cond  := and_chain (OR and_chain)*     -- Spark precedence:
      and_chain := cmp (AND cmp)*            -- AND over OR
      cmp   := expr CMP expr
    '/' and '%' additionally require a NONZERO LITERAL divisor
    (Spark's divide-by-zero semantics depend on the session's ANSI
    conf and cannot be reproduced soundly arrow-side).

    Spark semantics mirrored exactly where they differ from arrow
    defaults: '/' is ALWAYS double division, '%' is Java remainder
    (INT only, sign of the dividend; arrow integer divide truncates
    toward zero, so a - (a/b)*b matches — float '%' REFUSES, no
    true fmod kernel, ADVICE r15), int arithmetic stays int64, a
    NULL CASE condition selects the ELSE branch (comparisons
    fill_null False — sound for branch selection through AND/OR),
    CAST to int truncates toward zero. Edge domains ERROR rather
    than drift (ADVICE r15): +,-,*,unary- use CHECKED kernels
    (int64 overflow raises where Spark 4 ANSI raises, instead of
    wrapping), CASTs are safe=True (out-of-range / NaN raise) and
    CAST AS int round-trips through int32 so 32-bit overflow
    surfaces as a task error. Column types outside
    int/float/string refuse (decimal/timestamp arithmetic parity
    is precision- and zone-sensitive — append() handles those).
    Returns fn(batch) -> pa.Array."""
    toks: list[tuple] = []
    pos = 0
    while pos < len(expr):
        m = _EXPR_TOKEN.match(expr, pos)
        if m is None:
            break  # trailing whitespace is fine; garbage is
            # caught by the post-loop check (code-review r14)
        pos = m.end()
        if m.group("num") is not None:
            v = m.group("num")
            toks.append(("lit", float(v) if "." in v else int(v)))
        elif m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1]))
        elif m.group("id") is not None:
            up = m.group("id").upper()
            if up in _EXPR_KEYWORDS:
                toks.append(("kw", up))
            else:
                toks.append(("col", m.group("id")))
        else:
            toks.append(("op", m.group("op")))
    if expr[pos:].strip():
        return None
    toks.append(("end", None))

    def col_kind(name):
        t = types.get(name)
        if t in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if t in ("float", "double"):
            return "float"
        if t == "string":
            return "str"
        return None

    i = 0

    class _Bail(Exception):
        pass

    def peek():
        return toks[i]

    def take(kind=None, val=None):
        nonlocal i
        t = toks[i]
        if (kind and t[0] != kind) or (val is not None
                                       and t[1] != val):
            raise _Bail()
        i += 1
        return t

    # each node compiles to (fn(cols, n) -> array-or-python-scalar,
    # kind) where kind in {"int", "float", "str"}
    def p_expr():
        left = p_term()
        while peek() == ("op", "+") or peek() == ("op", "-"):
            op = take("op")[1]
            right = p_term()
            left = arith(left, right, op)
        return left

    def p_term():
        left = p_unary()
        while peek()[0] == "op" and peek()[1] in ("*", "/", "%"):
            op = take("op")[1]
            if op in ("/", "%"):
                # the divisor must be a NONZERO CONSTANT: Spark's
                # divide-by-zero semantics (NULL or ANSI error by
                # session conf) cannot be reproduced soundly
                # arrow-side for a column divisor — pc.divide gives
                # inf/raises instead (code-review r14); column
                # divisors refuse to append(). r15 (VERDICT r14
                # #8): the rule widens from a one-token literal
                # peek to any literal-only subexpression —
                # ``x / (2)``, ``x / -(2 + 3)`` — by parsing the
                # divisor and CONSTANT-FOLDING it (evaluation with
                # no columns; a column reference raises and
                # refuses). Refusal semantics otherwise unchanged.
                rf, rk = p_unary()
                try:
                    v = rf({}, 1)
                except Exception:
                    raise _Bail()  # not literal-only
                if not isinstance(v, (int, float)) or v == 0:
                    raise _Bail()
                left = arith(left,
                             ((lambda cols, n, _v=v: _v), rk), op)
                continue
            right = p_unary()
            left = arith(left, right, op)
        return left

    def p_unary():
        if peek() == ("op", "-"):
            take("op")
            fn, k = p_unary()
            if k == "str":
                raise _Bail()

            def neg(cols, n, _f=fn):
                import pyarrow.compute as pc
                v = _f(cols, n)
                return -v if isinstance(v, (int, float)) \
                    else pc.negate_checked(v)
            return neg, k
        return p_atom()

    def arith(left, right, op):
        import pyarrow as pa
        import pyarrow.compute as pc
        (lf, lk), (rf, rk) = left, right
        if "str" in (lk, rk):
            raise _Bail()
        if op == "%" and "float" in (lk, rk):
            # ADVICE r15 low: no true fmod kernel in arrow — the
            # a - trunc(a/b)*b emulation diverges from Java fmod at
            # extreme magnitudes (a/b -> inf). Refuse; append()'s
            # Spark-computed path handles float remainders.
            raise _Bail()
        out_k = ("float" if op == "/" or "float" in (lk, rk)
                 else "int")

        def run(cols, n):
            a, b = lf(cols, n), rf(cols, n)
            both_scalar = (isinstance(a, (int, float))
                           and isinstance(b, (int, float)))
            if op == "/":
                if both_scalar:
                    return a / b
                a = a if isinstance(a, (int, float)) \
                    else pc.cast(a, pa.float64())
                b = b if isinstance(b, (int, float)) \
                    else pc.cast(b, pa.float64())
                return pc.divide(float(a) if isinstance(
                    a, (int, float)) else a,
                    float(b) if isinstance(b, (int, float)) else b)
            if op == "%":
                if both_scalar:
                    import math as _m
                    return _m.fmod(a, b)
                # int-only (float refused above): |q*b| <= |a|, so
                # the checked kernels can't spuriously trip
                q = pc.divide(a, b)
                return pc.subtract_checked(
                    a, pc.multiply_checked(q, b))
            # CHECKED kernels (ADVICE r15 low): int64 overflow
            # raises ArrowInvalid -> the write task errors, exactly
            # where Spark 4's default ANSI mode raises — never a
            # silently wrapped stored value. Floats pass through
            # IEEE (checked == unchecked).
            f = {"+": pc.add_checked, "-": pc.subtract_checked,
                 "*": pc.multiply_checked}[op]
            if both_scalar:
                return {"+": a + b, "-": a - b, "*": a * b}[op]
            return f(a, b)
        return run, out_k

    def p_atom():
        t = peek()
        if t[0] == "lit":
            v = t[1]
            take("lit")
            k = ("str" if isinstance(v, str)
                 else "float" if isinstance(v, float) else "int")
            return (lambda cols, n, _v=v: _v), k
        if t[0] == "col":
            name = take("col")[1]
            k = col_kind(name)
            if k is None:
                raise _Bail()

            def get(cols, n, _c=name):
                try:
                    return cols[_c]
                except KeyError:
                    raise KeyError(
                        f"generated expression references column "
                        f"{_c!r} absent from the write batch")
            return get, k
        if t == ("op", "("):
            take("op", "(")
            node = p_expr()
            take("op", ")")
            return node
        if t == ("kw", "CAST"):
            return p_cast()
        if t == ("kw", "CASE"):
            return p_case()
        raise _Bail()

    def p_cast():
        import pyarrow as pa
        import pyarrow.compute as pc
        take("kw", "CAST")
        take("op", "(")
        fn, k = p_expr()
        take("kw", "AS")
        tgt = take("col")[1].lower()  # type name lexes as ident
        take("op", ")")
        if tgt in ("int", "bigint", "long"):
            if k == "str":
                raise _Bail()

            def c_i(cols, n, _f=fn, _narrow=(tgt == "int")):
                v = _f(cols, n)
                if isinstance(v, (int, float)):
                    v = int(v)  # Python trunc-toward-zero
                    if _narrow and not (-2**31 <= v < 2**31):
                        raise ValueError(
                            f"CAST({v} AS int) overflows int32")
                    return v
                # ADVICE r15 low: checked casts — float inputs
                # truncate toward zero (Spark CAST semantics), then
                # a SAFE cast raises ArrowInvalid on out-of-range /
                # NaN instead of silently wrapping; CAST AS int
                # additionally round-trips through int32 so 32-bit
                # overflow surfaces as a task error, never a
                # silently truncated stored value
                if pa.types.is_floating(v.type):
                    v = pc.trunc(v)
                v = pc.cast(v, pa.int64(), safe=True)
                if _narrow:
                    v = pc.cast(pc.cast(v, pa.int32(), safe=True),
                                pa.int64())
                return v
            return c_i, "int"
        if tgt == "double":
            if k == "str":
                raise _Bail()

            def c_d(cols, n, _f=fn):
                v = _f(cols, n)
                if isinstance(v, (int, float)):
                    return float(v)
                return pc.cast(v, pa.float64())
            return c_d, "float"
        if tgt == "string":
            if k != "int":  # float rendering differs from Spark
                raise _Bail()

            def c_s(cols, n, _f=fn):
                v = _f(cols, n)
                if isinstance(v, (int, float)):
                    return str(int(v))
                return pc.cast(pc.cast(v, pa.int64()), pa.string())
            return c_s, "str"
        raise _Bail()

    def p_cmp():
        import pyarrow as pa
        import pyarrow.compute as pc
        lf, lk = p_expr()
        opt = take("op")[1]
        if opt not in ("=", "==", "!=", "<>", "<", "<=", ">", ">="):
            raise _Bail()
        rf, rk = p_expr()
        if ("str" in (lk, rk)) != (lk == rk == "str"):
            raise _Bail()  # string vs numeric never compares
        cmp_f = {"=": pc.equal, "==": pc.equal,
                 "!=": pc.not_equal, "<>": pc.not_equal,
                 "<": pc.less, "<=": pc.less_equal,
                 ">": pc.greater, ">=": pc.greater_equal}[opt]

        def run(cols, n):
            a, b = lf(cols, n), rf(cols, n)
            if isinstance(a, (int, float, str)) \
                    and isinstance(b, (int, float, str)):
                ok = {"=": a == b, "==": a == b, "!=": a != b,
                      "<>": a != b, "<": a < b, "<=": a <= b,
                      ">": a > b, ">=": a >= b}[opt]
                return pa.array([ok] * n)
            return pc.fill_null(cmp_f(a, b), False)
        return run

    def p_and():
        import pyarrow.compute as pc
        node = p_cmp()
        while peek() == ("kw", "AND"):
            take("kw", "AND")
            rhs = p_cmp()

            def both(cols, n, _l=node, _r=rhs):
                return pc.and_(_l(cols, n), _r(cols, n))
            node = both
        return node

    def p_cond():
        # Spark precedence: AND binds tighter than OR — a flat
        # left-to-right walk silently computed wrong values for
        # `a AND b OR c` (code-review r14)
        import pyarrow.compute as pc
        node = p_and()
        while peek() == ("kw", "OR"):
            take("kw", "OR")
            rhs = p_and()

            def either(cols, n, _l=node, _r=rhs):
                return pc.or_(_l(cols, n), _r(cols, n))
            node = either
        return node

    def p_case():
        import pyarrow as pa
        import pyarrow.compute as pc
        take("kw", "CASE")
        arms = []
        while peek() == ("kw", "WHEN"):
            take("kw", "WHEN")
            cond = p_cond()
            take("kw", "THEN")
            arms.append((cond, p_expr()))
        if not arms:
            raise _Bail()
        els = None
        if peek() == ("kw", "ELSE"):
            take("kw", "ELSE")
            els = p_expr()
        take("kw", "END")
        kinds = {k for _c, (_f, k) in arms}
        if els is not None:
            kinds.add(els[1])
        if kinds == {"str"}:
            out_k = "str"
        elif "str" in kinds:
            raise _Bail()
        else:
            out_k = "float" if "float" in kinds else "int"

        def to_arr(v, n):
            if isinstance(v, (int, float, str)):
                if out_k == "float":
                    v = float(v)
                elif out_k == "int":
                    v = int(v)
                return pa.array([v] * n)
            if out_k == "float":
                return pc.cast(v, pa.float64())
            return v

        def run(cols, n):
            if els is None:
                t = {"str": pa.string(), "float": pa.float64(),
                     "int": pa.int64()}[out_k]
                out = pa.nulls(n, type=t)
            else:
                out = to_arr(els[0](cols, n), n)
            for cond, (vf, _vk) in reversed(arms):
                out = pc.if_else(cond(cols, n),
                                 to_arr(vf(cols, n), n), out)
            return out
        return run, out_k

    try:
        fn, kind = p_expr()
        take("end")
    except _Bail:
        return None

    def evaluate(batch):
        import pyarrow as pa
        cols = {nm: batch.column(j)
                for j, nm in enumerate(batch.schema.names)}
        n = batch.num_rows
        v = fn(cols, n)
        if isinstance(v, (int, float, str)):
            v = pa.array([v] * n)
        return v
    return evaluate


def _parse_conjuncts(condition: str,
                     tz: str | None = None
                     ) -> list[tuple[str, str, object]]:
    """The data-skipping view of a predicate: the top-level AND
    conjuncts of shape ``col OP literal`` (or the mirrored
    ``literal OP col``, flipped). Everything else — ORs, NOT,
    functions, col-to-col compares, IN lists — contributes nothing,
    which is the CONSERVATIVE direction: pruning only ever uses a
    recognized conjunct to PROVE a file cannot match, so an
    unrecognized conjunct can only cost IO, never rows. This is the
    same sound core Delta's data-skipping expression walk keeps.
    ``tz`` (the caller's Spark session timezone) unlocks
    ``timestamp '...'`` typed literals — see _parse_literal."""
    out = []
    for raw in _split_top_and(condition):
        c = raw.strip()
        while (c.startswith("(") and c.endswith(")")
               and _balanced(c[1:-1])):
            c = c[1:-1].strip()
        m = _NULL_RE.match(c)
        if m:
            out.append((m.group(1),
                        "notnull" if m.group(2) else "isnull", None))
            continue
        m = _CMP_RE.match(c)
        if m and _parse_literal(m.group(3), tz) is not None:
            op = "=" if m.group(2) == "==" else m.group(2)
            out.append((m.group(1), op,
                        _parse_literal(m.group(3), tz)))
            continue
        m = _CMP_REV_RE.match(c)
        if m and _parse_literal(m.group(1), tz) is not None:
            op = "=" if m.group(2) == "==" else _FLIP[m.group(2)]
            out.append((m.group(3), op,
                        _parse_literal(m.group(1), tz)))
    return out


def _balanced(s: str) -> bool:
    depth, quoted = 0, False
    for c in s:
        if quoted:
            quoted = c != "'"
        elif c == "'":
            quoted = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and not quoted


def _stat_excludes(st: list, op: str, lit, col_is_float: bool) -> bool:
    """True when a file's footer [min, max] PROVES no row satisfies
    ``col OP lit``. Sound under the two stat blind spots:

    - NULL rows: no comparison is ever TRUE of NULL, so min/max over
      the non-null values decides.
    - NaN rows (floats): footer stats EXCLUDE NaN, and Spark orders
      NaN ABOVE every number — so ``col > lit`` / ``col >= lit`` IS
      satisfied by a NaN row the stats cannot see. Lower-bound ops
      therefore never exclude a float-typed file (the read_range NaN
      rule, applied to DML pruning). ``<``/``<=``/``=`` are safe:
      NaN satisfies none of them against a finite literal.
    - cross-type compares (string stat vs numeric literal or vice
      versa) never exclude — incomparable pairs (datetime or
      Decimal literals against a foreign stat domain) fall to the
      TypeError guard, same conservative answer."""
    f_lo, f_hi = st
    if isinstance(lit, str) != isinstance(f_lo, str):
        return False
    try:
        if op == "<":
            return f_lo >= lit
        if op == "<=":
            return f_lo > lit
        if op == "=":
            return lit < f_lo or lit > f_hi
        if col_is_float:
            return False  # NaN may hide above f_hi
        if op == ">":
            return f_hi <= lit
        if op == ">=":
            return f_hi < lit
    except TypeError:
        return False
    return False


def _schema_types(snap: dict) -> dict[str, str]:
    """{column: simpleString type} from the recorded schema (empty
    when the table predates schema tracking)."""
    if not snap.get("schema"):
        return {}
    from pyspark.sql.types import StructType

    return {f.name: f.dataType.simpleString()
            for f in StructType.fromJson(json.loads(snap["schema"])).fields}


def _typed_partition_value(tok: str, type_str: str):
    """A partition directory token typed by the recorded schema —
    the same value domain footer stats live in (int / finite float /
    string), so partition values plug into every range test
    unchanged. DATE tokens stay ISO strings (r13, VERDICT r12 #3):
    code-point order over 'YYYY-MM-DD' IS date order, and pushed
    date literals normalize to the same ISO form — so
    ``ds >= date'...'`` on a date-partitioned table prunes through
    both the function API and ``format("txlog")``. Types outside
    the domain (timestamp, bool, decimal) return None = no pruning
    from that column, conservative like a missing footer stat."""
    try:
        if type_str in ("tinyint", "smallint", "int", "bigint"):
            return int(tok)
        if type_str in ("float", "double"):
            v = float(tok)
            return v if math.isfinite(v) else None
        if type_str == "string":
            return tok
        if type_str == "date":
            return tok  # ISO 'YYYY-MM-DD': lexical == chronological
        if type_str == "timestamp":
            # r14 (VERDICT r13 #5): UTC-normalized tokens ('T'
            # form, _utc_token) are lexically chronological and
            # share the domain _lit_norm gives aware datetime
            # literals. Legacy space-form tokens (writer-session
            # wall time, unknown zone) stay inert.
            return tok if "T" in tok else None
    except (ValueError, TypeError):
        return None
    return None


def _inv_colmap(snap: dict) -> dict[str, str] | None:
    """{physical: logical} when the snapshot carries a non-identity
    column mapping, else None — the one translation the stat
    consumers need: file-side metadata (footer stats, null counts,
    partition tokens) is keyed PHYSICALLY, predicates and merge
    keys arrive LOGICALLY."""
    cmap = snap.get("colmap") or {}
    return ({v: k for k, v in cmap.items()} if cmap else None)


def _effective_stats(meta: dict, types: dict[str, str],
                     inv: dict | None = None) -> dict:
    """A file's pruning view: footer [min,max] ranges PLUS its
    partition values as exact [v, v] ranges (a partition value is
    the strongest possible stat — every row agrees). NULL partition
    values contribute nothing (no comparison selects NULL rows, but
    a range test can't express that; conservative). ``inv``
    (physical -> logical) re-keys everything to the logical names
    consumers test against on column-mapped tables."""
    part = meta.get("partition")
    stats = meta.get("stats", {})
    if inv:
        stats = {inv.get(c, c): v for c, v in stats.items()}
    if not part:
        return stats
    eff = dict(stats)
    for c, tok in part.items():
        lc = inv.get(c, c) if inv else c
        if tok is None or lc in eff:
            continue
        v = _typed_partition_value(tok, types.get(lc, "string"))
        if v is not None:
            eff[lc] = [v, v]
    return eff


def _prune_survives(m: dict, conjuncts: list[tuple], types: dict,
                    float_cols: set, cmap: dict, inv: dict) -> bool:
    """The per-file range/null/partition survival test — shared by
    the driver prune loop and the distributed checkpoint-prune job
    (one truth, two execution venues). A file survives unless SOME
    conjunct's test proves it can't match; missing stats always
    survive. Bloom refinement is NOT here — it runs as a second
    pass over the survivors."""
    stats = _effective_stats(m, types, inv)
    for col, op, lit in conjuncts:
        pcol = cmap.get(col, col)  # physical key for raw
        # file-side metadata (nulls / partition tokens)
        if op == "in":
            # IN-list (r13): the file survives if ANY value might
            # hit — one metadata pass for the whole list instead of
            # one pass per value
            st = stats.get(col)
            if st is not None:
                # NaN blind spot applies to REAL float columns
                # only: trust the schema when it knows the column
                # (r14 — decimal stats are floats but decimals
                # have no NaN); value-type fallback for schema-less
                # tables
                is_f = (col in float_cols if col in types
                        else isinstance(st[0], float))
                if all(_stat_excludes(st, "=", v, is_f)
                       for v in lit):
                    return False
            continue
        if op in ("isnull", "notnull"):
            # NULL-count skipping (r11): a partition token is
            # definitive for its column (None = every row NULL);
            # otherwise the footer null counts decide. Absent
            # stats survive, as always.
            part = m.get("partition") or {}
            if pcol in part:
                tok = part[pcol]
                if (tok is not None) == (op == "isnull"):
                    return False
                continue
            nl = m.get("nulls", {}).get(pcol)
            if nl is None:
                continue
            n_null, n_rows = nl
            if ((op == "isnull" and n_null == 0)
                    or (op == "notnull" and n_rows > 0
                        and n_null == n_rows)):
                return False
            continue
        st = stats.get(col)
        if st is not None:
            is_f = (col in float_cols if col in types
                    else isinstance(st[0], float))
            if _stat_excludes(st, op, lit, is_f):
                return False
    return True


# Above this many checkpoint entries, stat pruning runs as one Spark
# job over the columnar checkpoint instead of a driver loop:
# executors parse the metas in parallel and only the SURVIVORS (plus
# the small log suffix) ever materialize on the driver.
_DISTRIBUTED_PRUNE_BOUND = 50_000

# Tests flip this off to pin the driver-loop / Spark-job regimes
# against the stats_parsed vector path (three-way parity).
_VECTOR_PRUNE = True


def _cp_eff_range(tbl, names: set, pcol: str, lc: str,
                  types: dict):
    """Effective (lo, hi) stat arrays for physical ``pcol`` /
    logical ``lc`` over a stats_parsed checkpoint table — footer
    columns with partition tokens filling the NULL cells, typed by
    the query-time schema. Shared by the vectorized scan prune and
    the vectorized merge touch test."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lo = (tbl.column(f"s_lo:{pcol}")
          if f"s_lo:{pcol}" in names else None)
    hi = (tbl.column(f"s_hi:{pcol}")
          if f"s_hi:{pcol}" in names else None)
    tk = (tbl.column(f"s_pt:{pcol}")
          if f"s_pt:{pcol}" in names else None)
    if tk is not None:
        t = types.get(lc, "string")
        if t in ("tinyint", "smallint", "int", "bigint"):
            try:
                tk = pc.cast(tk, pa.int64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                tk = None
        elif t in ("float", "double"):
            try:
                tk = pc.cast(tk, pa.float64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                tk = None
        elif t == "timestamp":
            # only UTC-normalized ('T'-form) tokens are in the
            # sortable domain (mirrors _typed_partition_value);
            # legacy space-form cells null out
            tk = pc.if_else(
                pc.match_substring(tk, "T"), tk,
                pa.scalar(None, pa.string()))
        elif t not in ("string", "date"):
            # bool/decimal tokens: no stat domain (mirrors
            # _typed_partition_value returning None)
            tk = None
    if tk is not None:
        # footer stat wins where present; the token fills NULL
        # cells. A type conflict (e.g. int64 footer vs float64
        # token after widening) drops the token — conservative
        lo = (tk if lo is None
              else (pc.coalesce(lo, tk) if lo.type == tk.type
                    else lo))
        hi = (tk if hi is None
              else (pc.coalesce(hi, tk) if hi.type == tk.type
                    else hi))
    return lo, hi


def _cp_vector_prune(store: "_CpStore", conjuncts: list[tuple],
                     types: dict, float_cols: set,
                     cmap: dict | None, inv: dict | None):
    """IN-PROCESS vectorized stat prune over a checkpoint carrying
    stats_parsed columns (VERDICT r13 #1 — the last O(files) hot
    surface): the recognized conjuncts' exclusion masks evaluate as
    pyarrow compute directly on the checkpoint buffers — no Spark
    job, no json.loads per file; only SURVIVORS parse their metas.
    Returns (paths, meta-JSON strings) of the surviving checkpoint
    rows, or None when the checkpoint predates stat columns or no
    conjunct is vectorizable (the caller's driver-loop /
    Spark-job regimes take over).

    Soundness mirrors _stat_excludes/_prune_survives cell-for-cell:
    - a NULL stat cell never excludes (fill_null False);
    - float columns: lower-bound ops never exclude (NaN hides
      above max);
    - cross-domain compares skip the conjunct (conservative, the
      TypeError guard's vector twin);
    - int columns vs float literals compare through EXACT
      floor/ceil thresholds, never a lossy cast; float columns vs
      int literals only below 2**53;
    - partition tokens fill a NULL footer cell as an exact [v, v]
      range typed by the QUERY-TIME schema (footer precedence,
      mirroring _effective_stats)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    if not store.has_stats():  # footer-metadata check, no IO
        return None
    cmap = cmap or {}
    inv = inv or {}

    def _phys(col):
        if col in cmap:
            return cmap[col]
        if col in inv:
            # `col` is the PHYSICAL name of some other mapped
            # column — _effective_stats would re-key that stat away
            # from this name, so the checkpoint column must not
            # answer for it
            return None
        return col

    def _lit_adapt(arr, lit, imode, fdir):
        """``lit`` adapted for an EXACT-or-safe compare against
        ``arr``, or None = incomparable (conjunct skipped).
        ``imode`` (floor/ceil) is the EXACT integer threshold for
        fractional literals on int columns; ``fdir`` (up/down) is
        the SAFE rounding direction when an inexact literal
        (Decimal, r14) must land on the float grid — rounding that
        way makes the exclusion test strictly harder, never
        unsound."""
        import decimal as _dec

        if arr is None or lit is None or isinstance(lit, bool):
            return None
        t = arr.type
        if pa.types.is_string(t):
            return lit if isinstance(lit, str) else None
        if isinstance(lit, str):
            return None
        if pa.types.is_integer(t):
            if isinstance(lit, int):
                return lit
            if isinstance(lit, (float, _dec.Decimal)):
                if isinstance(lit, float) and not math.isfinite(lit):
                    return None
                if (isinstance(lit, _dec.Decimal)
                        and not lit.is_finite()):
                    return None
                return (math.ceil(lit) if imode == "ceil"
                        else math.floor(lit))
            return None
        if pa.types.is_floating(t):
            if isinstance(lit, int):
                return float(lit) if abs(lit) < 2 ** 53 else None
            if isinstance(lit, float):
                return lit if not math.isnan(lit) else None
            if isinstance(lit, _dec.Decimal):
                if not lit.is_finite():
                    return None
                # one rounding implementation (code-review r14):
                # _dec_widen rounds DOWN when is_lo — 'down' here
                return _dec_widen(lit, is_lo=(fdir == "down"))
        return None

    def _eff_range(tbl, names, pcol, lc):
        return _cp_eff_range(tbl, names, pcol, lc, types)

    def _eq_excl(lo, hi, lit):
        """Exclusion mask for ``col = lit`` over [lo, hi], or
        None."""
        parts = []
        # lo > lit  <=>  lo > floor(lit) on an int column
        l2 = _lit_adapt(lo, lit, "floor", "up")
        if l2 is not None:
            parts.append(pc.fill_null(pc.greater(lo, l2), False))
        # hi < lit  <=>  hi < ceil(lit) on an int column
        h2 = _lit_adapt(hi, lit, "ceil", "down")
        if h2 is not None:
            parts.append(pc.fill_null(pc.less(hi, h2), False))
        # (a non-integral float literal can never equal an int row,
        # but the per-file loop doesn't use that fact either —
        # exact regime parity is worth more than pruning a
        # degenerate predicate)
        if not parts:
            return None
        out = parts[0]
        for p_ in parts[1:]:
            out = pc.or_(out, p_)
        return out

    def _op_excl(lo, hi, op, lit, is_f):
        if op in ("=", "=="):
            return _eq_excl(lo, hi, lit)
        if op == "<":
            l2 = _lit_adapt(lo, lit, "ceil", "up")  # lo >= ceil
            return (None if l2 is None
                    else pc.greater_equal(lo, l2))
        if op == "<=":
            l2 = _lit_adapt(lo, lit, "floor", "up")  # lo > floor
            return None if l2 is None else pc.greater(lo, l2)
        if is_f:
            return None  # NaN may hide above hi (float rule)
        if op == ">":
            l2 = _lit_adapt(hi, lit, "floor", "down")  # hi <= floor
            return None if l2 is None else pc.less_equal(hi, l2)
        if op == ">=":
            l2 = _lit_adapt(hi, lit, "ceil", "down")  # hi < ceil
            return None if l2 is None else pc.less(hi, l2)
        return None

    def _excl_for(tbl):
        """Exclusion mask over ONE stats slice (the resident
        projection, or one streamed row group), or None when no
        conjunct is vectorizable against its schema."""
        names = set(tbl.schema.names)
        excluded = None

        def _merge(ex):
            nonlocal excluded
            ex = pc.fill_null(ex, False)
            excluded = (ex if excluded is None
                        else pc.or_(excluded, ex))

        for col, op, lit in conjuncts:
            pcol = _phys(col)
            if pcol is None:
                continue
            try:
                if op in ("isnull", "notnull"):
                    pn = (tbl.column(f"s_pn:{pcol}")
                          if f"s_pn:{pcol}" in names else None)
                    nulls_ex = None
                    if (f"s_nn:{pcol}" in names
                            and f"s_nr:{pcol}" in names):
                        nn = tbl.column(f"s_nn:{pcol}")
                        nr = tbl.column(f"s_nr:{pcol}")
                        if op == "isnull":
                            nulls_ex = pc.equal(nn, 0)
                        else:
                            nulls_ex = pc.and_(pc.greater(nr, 0),
                                               pc.equal(nn, nr))
                    if pn is not None:
                        # a partition token is DEFINITIVE for its
                        # column where present (pn valid);
                        # elsewhere the footer null counts decide
                        part_ex = (pc.equal(pn, False)
                                   if op == "isnull"
                                   else pc.equal(pn, True))
                        ex = (pc.if_else(pc.is_valid(pn), part_ex,
                                         nulls_ex)
                              if nulls_ex is not None else part_ex)
                    else:
                        ex = nulls_ex
                    if ex is not None:
                        _merge(ex)
                    continue
                lo, hi = _eff_range(tbl, names, pcol, col)
                if lo is None and hi is None:
                    continue
                # schema-first float detection (r14): decimal stat
                # columns are float64 but decimals carry no NaN
                is_f = (col in float_cols if col in types
                        else ((lo is not None
                               and pa.types.is_floating(lo.type))
                              or (hi is not None
                                  and pa.types.is_floating(
                                      hi.type))))
                if op == "in":
                    ex = None
                    ok = True
                    for v in lit:
                        m = _eq_excl(lo, hi, v)
                        if m is None:
                            ok = False  # a value may hit anywhere
                            break
                        m = pc.fill_null(m, False)
                        ex = m if ex is None else pc.and_(ex, m)
                    if ok and ex is not None:
                        _merge(ex)
                    continue
                ex = _op_excl(lo, hi, op, lit, is_f)
                if ex is not None:
                    _merge(ex)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    OverflowError, ValueError, TypeError):
                continue  # incomparable: conjunct adds nothing
        return excluded

    # One pass over the stats projection — resident in one slice
    # for small checkpoints (cached, repeat plans free), streamed
    # one row group at a time past _CP_STREAM_BYTES so the peak
    # working set is one slice regardless of table size (VERDICT
    # r14 #1). The keep vector itself is 1 byte/file.
    keeps: list = []
    any_mask = False
    for _off, sl in store.stats_stream():
        ex = _excl_for(sl)
        if ex is None:
            keeps.append(np.ones(sl.num_rows, dtype=bool))
        else:
            any_mask = True
            kp = pc.invert(ex)
            if isinstance(kp, pa.ChunkedArray):
                kp = kp.combine_chunks()
            keeps.append(kp.to_numpy(zero_copy_only=False)
                         .astype(bool, copy=False))
    if not any_mask:
        return None
    keep_np = (keeps[0] if len(keeps) == 1
               else np.concatenate(keeps))
    n = keep_np.size
    n_keep = int(keep_np.sum())
    if store._tbl is not None:
        # full table already resident: zero-IO filter
        kept = store.table().select(["path", "meta"]).filter(
            pa.array(keep_np))
        return (kept.column("path").to_pylist(),
                kept.column("meta").to_pylist())
    if n_keep <= max(_PRUNE_TAKE_BOUND, n // 4):
        import pyarrow.dataset as ds
        idx = np.flatnonzero(keep_np)
        kept = (ds.dataset(store.path)
                .take(pa.array(idx), columns=["path", "meta"]))
        return (kept.column("path").to_pylist(),
                kept.column("meta").to_pylist())
    # unselective predicate: one sequential pass over path+meta
    # beats a scattered take, and filtering per row group keeps the
    # peak at one slice (the survivors' python strings are the
    # O(survivors) contract either way)
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(store.path)
    paths_out: list = []
    metas_out: list = []
    off = 0
    for rg in range(pf.metadata.num_row_groups):
        t = pf.read_row_group(rg, columns=["path", "meta"])
        nrg = t.num_rows  # group size BEFORE filtering — the mask
        # offset advances by it, never by the survivor count
        t = t.filter(pa.array(keep_np[off:off + nrg]))
        off += nrg
        paths_out.extend(t.column("path").to_pylist())
        metas_out.extend(t.column("meta").to_pylist())
    return paths_out, metas_out


def _files_possibly_matching(snap: dict,
                             conjuncts: list[tuple],
                             snap_root: str | None = None,
                             spark=None) -> list[str]:
    """Stat-prune the live set against the predicate's recognized
    conjuncts: a file survives unless SOME conjunct's range test
    proves it can't match (missing stats always survive). Partition
    values join the test as exact ranges via _effective_stats (r11).
    Float detection uses the recorded schema when present, else the
    stat value's Python type — both err toward float (less
    pruning).

    SCALE (VERDICT r12 #1): when the snapshot rides a columnar
    checkpoint bigger than _DISTRIBUTED_PRUNE_BOUND and a spark
    handle is given, the range test runs as ONE Spark job over the
    checkpoint parquet — the driver receives the surviving (path,
    meta) pairs plus evaluates the log suffix locally, so a pruned
    point query on a million-file table materializes O(survivors),
    not O(files), driver-side. Survivor metas seed the store's
    overlay so downstream planning resolves them without building
    the full path index.

    BLOOM probing has two regimes (the _KEY_COLLECT_BOUND pattern):
    up to _BLOOM_DRIVER_LOAD_BOUND range-surviving candidates load
    their sidecars on the driver (cached, metadata-scale IO);
    beyond it — a point lookup on a hash-scattered MILLION-file
    table, where ranges keep everything — the probes run as one
    Spark job over (path, sidecar) pairs when ``spark`` is given,
    so the driver never reads a million JSON files. Without a
    spark handle the over-bound case skips bloom refinement
    entirely (conservative: range survivors stay)."""
    types = _schema_types(snap)
    float_cols = {c for c, t in types.items()
                  if t in ("float", "double")}
    inv = _inv_colmap(snap)
    cmap = snap.get("colmap") or {}
    # sidecars are probed ONLY for columns in the snapshot's LIVE
    # bloom spec: a dropped index's stale sidecar keyed by a reused
    # logical name (drop index -> rename -> rename another column
    # into the old name) would otherwise mis-prune (code-review r11)
    bloom_cols = set((snap.get("bloom") or {}).get("cols", []))
    eq_conjs = [(c, l) for c, o, l in conjuncts
                if o in ("=", "==", "in") and c in bloom_cols]
    files = snap["files"]
    store = files._store if isinstance(files, _LazyFiles) else None
    survivors: list[tuple]  # (path, meta)
    n_bloom_cand = 0
    vec = (_cp_vector_prune(store, conjuncts, types, float_cols,
                            cmap, inv)
           if _VECTOR_PRUNE and store is not None and conjuncts
           else None)
    if vec is not None:
        # stats_parsed fast path (VERDICT r13 #1): the conjunct
        # test already ran as pyarrow compute over the checkpoint
        # buffers — works with OR WITHOUT a spark handle, so the
        # format("txlog") plan path (no handle inside planning)
        # rides it too. Only survivors parse their metas.
        vpaths, vmetas = vec
        dead = files._removed | set(files._added)
        survivors = [(p, json.loads(mj))
                     for p, mj in zip(vpaths, vmetas)
                     if p not in dead]
        if len(survivors) <= 10_000:
            # bounded overlay seed, same rule as the other regimes
            store._overlay.update(dict(survivors))
        # the suffix's own adds evaluate driver-side (small)
        survivors.extend(
            (p, m) for p, m in files._added.items()
            if _prune_survives(m, conjuncts, types, float_cols,
                               cmap, inv))
        if eq_conjs:
            n_bloom_cand = sum(1 for _p, m in survivors
                               if "bloom" in m)
    elif (spark is not None and store is not None and conjuncts
            and store.n > _DISTRIBUTED_PRUNE_BOUND):
        _ship_package(spark)  # job closure refs module helpers
        import pandas as pd  # noqa: F401  (worker dependency)
        conj, typ, fcols, cm = (list(conjuncts), dict(types),
                                set(float_cols), dict(cmap))
        iv = dict(inv) if inv is not None else None

        def _scan(batches):
            import pandas as _pd
            for pdf in batches:
                kp, km = [], []
                for p, mj in zip(pdf["path"], pdf["meta"]):
                    m = json.loads(mj)
                    if _prune_survives(m, conj, typ, fcols, cm, iv):
                        kp.append(p)
                        km.append(mj)
                yield _pd.DataFrame({"path": kp, "meta": km})

        cp_df = spark.read.parquet(store.path) \
            .select("path", "meta")  # stat columns stay columnar
        rows = (cp_df.mapInPandas(_scan, "path string, meta string")
                .collect())
        dead = files._removed | set(files._added)
        survivors = []
        for r in rows:
            if r["path"] in dead:
                continue  # suffix removed/shadowed this path
            survivors.append((r["path"], json.loads(r["meta"])))
        if len(survivors) <= 10_000:
            # seed the store overlay so planners resolve survivors
            # without the full path index — bounded exactly like the
            # driver branch (an unselective predicate must not pin
            # a million parsed metas in the process-global store
            # cache — code-review r13)
            store._overlay.update(dict(survivors))
        # the suffix's own adds evaluate driver-side (small)
        survivors.extend(
            (p, m) for p, m in files._added.items()
            if _prune_survives(m, conjuncts, types, float_cols,
                               cmap, inv))
        if eq_conjs:
            # regime choice: only SURVIVORS are ever bloom-probed,
            # and their metas are already driver-side — no extra
            # Spark job, and the count reflects the actual number
            # of sidecar loads the driver would do
            n_bloom_cand = sum(1 for _p, m in survivors
                               if "bloom" in m)
    else:
        survivors = [
            (p, m) for p, m in files.items()
            if _prune_survives(m, conjuncts, types, float_cols,
                               cmap, inv)]
        if eq_conjs:
            n_bloom_cand = sum(1 for m in files.values()
                               if "bloom" in m)
        if (store is not None and conjuncts
                and len(survivors) <= 10_000):
            # seed the store overlay so the planner's per-survivor
            # lookups never build the full path index (bounded: an
            # unselective predicate seeds nothing)
            store._overlay.update(
                {p: m for p, m in survivors
                 if p not in files._added})
    driver_probe = n_bloom_cand <= _BLOOM_DRIVER_LOAD_BOUND
    pending: list[tuple] = []  # (path, sidecar abs, col, lit)
    keep = []
    for p, m in survivors:
        excluded = False
        if eq_conjs and "bloom" in m and snap_root:
            for col, op, lit in conjuncts:
                if op not in ("=", "==", "in") \
                        or col not in bloom_cols:
                    continue
                # an IN survives when ANY value might hit; a plain
                # equality is the one-value case of the same rule
                lits = tuple(lit) if op == "in" else (lit,)
                pcol = cmap.get(col, col)
                # sidecars are PHYSICALLY keyed (ADVICE r11): a
                # reused logical name can never revive a stale entry
                if driver_probe:
                    # point-equality refinement: ranges said
                    # "maybe"; the per-file filter can still prove
                    # absence
                    ent = _bloom_probe_entry(
                        snap_root, m["bloom"],
                        os.path.basename(p), pcol)
                    if ent is not None and all(
                            not _bloom_might_contain(ent, v)
                            for v in lits):
                        excluded = True
                        break
                elif spark is not None:
                    pending.append((p, m["bloom"], pcol, lits))
        if not excluded:
            keep.append(p)
    if pending and spark is not None:
        root_abs = os.path.abspath(snap_root)

        def _probe(job):
            p, ref, pcol, lits = job  # lits: tuple of candidates
            path = os.path.join(
                root_abs, ref["path"] if isinstance(ref, dict)
                else ref)
            try:
                with open(path) as fh:
                    sc = json.load(fh)
            except (OSError, ValueError):
                # missing/torn sidecar: degrade to no pruning
                return None
            if isinstance(ref, dict):
                sc = sc.get(ref.get("key", os.path.basename(p))) \
                    or {}
            ent = sc.get(pcol)
            if ent is not None and all(
                    not _bloom_might_contain(ent, v)
                    for v in lits):
                return p
            return None

        _ship_package(spark)  # closure refs module helpers
        drop = set(spark.sparkContext.parallelize(
            pending, min(len(pending), 256)).map(_probe)
            .filter(lambda x: x is not None).collect())
        if drop:
            keep = [p for p in keep if p not in drop]
    return keep


def _files_with_hits(spark, root: str, snap: dict,
                     candidates: list[str], cond) -> list[str]:
    """Phase 2 of DML file-finding (the Delta DELETE shape): scan
    the stat-surviving candidates ONCE with the exact predicate and
    keep only the files that actually contain a matching row —
    rewrites then touch precisely the hit files, not every
    stat-plausible one. The collect is file NAMES (log-metadata
    scale, one short string per candidate file), never rows.

    Provenance comes from _metadata.file_name (not
    input_file_name(), which is unreliable after a join — and the
    dv-aware _read_files may anti-join deleted positions away
    before the predicate runs, so a file whose only matching rows
    are already deleted correctly stops counting as a hit)."""
    from pyspark.sql import functions as F

    hits = (_read_files(spark, root, snap, sorted(candidates),
                        with_meta=True)
            .where(cond)
            .select(F.col(_DV_FILE).alias("_f"))
            .distinct().collect())
    names = {r[0] for r in hits}
    return sorted(p for p in candidates if os.path.basename(p) in names)



def _mark_feature(entry: dict, snap: dict, name: str) -> None:
    """Record a table feature on the commit that first uses it
    (monotone; repeats are skipped — the snapshot already carries
    it)."""
    if name not in snap.get("features", []):
        entry.setdefault("features", []).append(name)

def _dv_mark_actions(spark, root: str, snap: dict,
                     touched: list[str], matches: DataFrame,
                     per_file: dict) -> list[dict]:
    """Build the remove/re-add actions that MARK rows deleted via a
    new sidecar: ``matches`` is the (_DV_FILE, _DV_POS) set of rows
    leaving the table, ``per_file`` maps each touched basename to
    (live rows, matching rows) — a bounded collect the caller
    already ran (one row per touched file). Files whose every live
    row matches are dropped outright (remove, no re-add — the Delta
    full-file shortcut); the rest are re-added with a ``dv`` ref to
    ONE new sidecar dir holding the CUMULATIVE deleted positions
    (new matches unioned with the files' previous vectors, which
    are disjoint by construction — already-deleted positions can't
    re-match through the dv-applied read)."""
    from pyspark.sql import functions as F

    full = {n for n, (live, hit) in per_file.items() if hit == live}
    keep_touched = [p for p in touched
                    if os.path.basename(p) not in full]
    actions = [{"remove": {"path": p}} for p in touched]
    if keep_touched:
        out = (matches
               .where(~F.col(_DV_FILE).isin(list(full))
                      if full else F.lit(True))
               .select(F.col(_DV_FILE).alias("file"),
                       F.col(_DV_POS).alias("pos")))
        old_refs = _dv_refs(snap["files"], keep_touched)
        dv_rel = f"{_DV_DIR}/dv-{uuid.uuid4().hex}"
        total = sum(per_file[os.path.basename(p)][1]
                    + (old_refs.get(os.path.basename(p), {})
                       .get("deleted", 0))
                    for p in keep_touched)
        if _DV_LOCAL_POSITIONS > 0 and total <= _DV_LOCAL_POSITIONS:
            # r15 size-gated local sidecar write: the cumulative
            # row count is EXACTLY `total` (new hits + carried old
            # vectors, both already counted), so the bound check is
            # exact before any byte moves. One narrow Arrow collect
            # of the new matches; the carried old vectors are read
            # driver-side from their sidecar parquet (local files,
            # columns file/pos only) — identical row SET to the
            # distributed union, and readers only ever anti-join
            # the set. Past the gate: the unchanged distributed
            # repartition+write below.
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as _pq
            schema = pa.schema([("file", pa.string()),
                                ("pos", pa.int64())])
            tabs = [out.toArrow().cast(schema)]
            # same restriction as _dv_table: rows for the files
            # whose CURRENT ref points at the old sidecars
            ref_names = pa.array(sorted(old_refs), type=pa.string())
            for d in sorted({r["path"] for r in old_refs.values()}):
                dd = os.path.join(root, d)
                for f in sorted(os.listdir(dd)):
                    if not f.endswith(".parquet"):
                        continue
                    t = _pq.read_table(os.path.join(dd, f),
                                       columns=["file", "pos"])
                    mask = pc.is_in(t.column("file"),
                                    value_set=ref_names)
                    tabs.append(t.filter(mask).cast(schema))
            dv_dir = os.path.join(root, dv_rel)
            os.makedirs(dv_dir, exist_ok=True)
            _pq.write_table(
                pa.concat_tables(tabs),
                os.path.join(dv_dir,
                             f"part-{uuid.uuid4().hex}.parquet"))
        else:
            if old_refs:
                out = out.unionByName(
                    _dv_table(spark, root, old_refs, for_join=False))
            n_parts = max(1, math.ceil(total / 20_000_000))
            out.repartition(n_parts).write.parquet(
                os.path.join(root, dv_rel))
            _clean_non_parquet(os.path.join(root, dv_rel))
        for p in keep_touched:
            name = os.path.basename(p)
            deleted = per_file[name][1] + (
                old_refs.get(name, {}).get("deleted", 0))
            actions.append({"add": {**snap["files"][p],
                                    "dv": {"path": dv_rel,
                                           "deleted": deleted}}})
    return actions


def _dv_delete_actions(spark, root: str, snap: dict,
                       candidates: list[str], cond
                       ) -> tuple[list[str], list[dict]]:
    """Merge-on-read predicate delete: ONE narrow scan of the
    stat-surviving CANDIDATES computes the per-file (live,
    matching) counts — which is also the exact hit test, so the
    separate _files_with_hits pass the rewrite path needs is fused
    away (r15; guide §2.4 — one pass decides AND plans). Returns
    (touched, actions): touched = the files with a real live match
    (empty = provably-no-op, the caller commits nothing), and the
    matching (file, pos) positions feed _dv_mark_actions."""
    from pyspark.sql import functions as F

    base = _read_files(spark, root, snap, candidates, with_meta=True)
    flag = cond.isNotNull() & cond
    per_all = {r[0]: (r[1], r[2]) for r in
               (base.groupBy(_DV_FILE)
                .agg(F.count(F.lit(1)).alias("live"),
                     F.sum(flag.cast("long")).alias("hit"))
                .collect())}
    per_file = {n: (live, hit) for n, (live, hit) in per_all.items()
                if hit}
    touched = sorted(p for p in candidates
                     if os.path.basename(p) in per_file)
    if not touched:
        return [], []
    return touched, _dv_mark_actions(spark, root, snap, touched,
                                     base.where(flag), per_file)


def delete_where(spark, root: str, condition: str,
                 max_retries: int = 5, checkpoint_every: int = 10,
                 mode: str = "rewrite") -> int:
    """DELETE FROM <table> WHERE <condition> — predicate DML at FILE
    granularity (r11; completes the Delta DML trio next to
    merge_upsert/merge_delete's by-key paths). Two-phase file
    finding: (1) footer-stat pruning over the predicate's
    recognized ``col OP literal`` conjuncts drops every file whose
    range provably can't match (NaN/NULL/cross-type rules in
    _stat_excludes); (2) one exact scan of the survivors keeps only
    files with a REAL matching row. A delete that provably (or
    actually) matches nothing is a NO-OP returning the unchanged
    head — no version churn.

    ``mode`` picks the write strategy over exactly those hit files:

    - "rewrite" (default; copy-on-write, the Delta DELETE shape):
      hit files are read and rewritten holding survivors only
      (survivor rows = NOT(cond) OR cond IS NULL — SQL DELETE keeps
      NULL-predicate rows); every other add action carries
      verbatim, unopened.
    - "dv" (merge-on-read, the Delta deletion-vector / Iceberg v2
      positional-delete shape): NO data file is rewritten — the
      matching rows' physical positions land in a small parquet
      sidecar under _dv/ and each hit file's add action is
      re-committed with a ``dv`` ref; every read path anti-joins
      the vector away (see _read_files), and any later rewrite of
      the file (merge, DML, OPTIMIZE — which purges vectors past
      _DV_PURGE_RATIO) materializes the delete. A file whose every
      live row matches is dropped outright. Deleting 0.1% of a
      100 TB table costs megabytes of sidecar, not terabytes of
      rewrite; the price is the apply-side anti-join on each read
      until OPTIMIZE purges.

    Commits as op="delete" with the predicate (and dv mode)
    recorded for audit. Stream/CDF contract: the stream source
    raises NonAppendChange on either mode (a dv commit's add files
    are the ORIGINAL bytes, so the stream additionally refuses to
    re-emit them even under ignore_changes — they carry no new
    rows and are skipped); read_changes tags op="delete" and
    applies the commit's own vectors, keeping the survivors-only
    contract exact in both modes."""
    from pyspark.sql import functions as F

    if mode not in ("rewrite", "dv"):
        raise ValueError(f"delete_where mode={mode!r}: "
                         f"expected 'rewrite' or 'dv'")
    _tz = spark.conf.get("spark.sql.session.timeZone", None)
    for _ in range(max_retries):
        snap = snapshot(root)
        if not snap["files"]:
            return snap["version"]
        cond = F.expr(condition)
        cand = _files_matching_pred(snap, condition, root, spark,
                                    tz=_tz)
        if cand is None:
            cand = sorted(snap["files"])
        if not cand:
            return snap["version"]
        if mode == "dv":
            # fused hit test (r15): the per-file counts scan over
            # the candidates IS the exact hit test — no separate
            # _files_with_hits job
            touched, actions = _dv_delete_actions(spark, root, snap,
                                                  cand, cond)
            if not touched:
                return snap["version"]
        else:
            touched = _files_with_hits(spark, root, snap, cand, cond)
            if not touched:
                return snap["version"]
            survivors = _size_merge_output(
                _read_files(spark, root, snap, touched)
                .where(~cond | cond.isNull()), snap, touched)
            adds = _stage_write(survivors, root,
                                snap.get("partition_by"),
                                snap.get("colmap"),
                                snap.get("bloom"))
            actions = ([{"remove": {"path": p}} for p in touched]
                       + [{"add": a} for a in adds])
        entry = {"op": "delete", "ts": time.time(),
                 "predicate": condition,
                 "actions": actions}
        if mode == "dv":
            entry["mode"] = "dv"
            _mark_feature(entry, snap, "deletion-vectors")
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1, checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"delete_where lost the snapshot race {max_retries} times "
        f"under {root}")


def update_where(spark, root: str, condition: str,
                 assignments: dict[str, str],
                 max_retries: int = 5, checkpoint_every: int = 10,
                 mode: str = "rewrite") -> int:
    """UPDATE <table> SET col = expr, ... WHERE <condition> — the
    predicate-UPDATE half of the DML surface (r11), same two-phase
    file finding as delete_where. Semantics are SQL UPDATE's:

    - every assignment expression evaluates against the OLD row (all
      assignments see pre-update values, applied simultaneously);
    - a row updates only when the predicate is TRUE (NULL = keep);
    - each assigned expression is cast back to the column's recorded
      type, so the table schema never drifts through an update;
    - live CHECK constraints are enforced on the UPDATED rows before
      the commit (old rows hold by induction — they passed at their
      own write or at add_constraint's retro-validation).

    Only files containing a matching row are rewritten; the rewrite
    carries matched rows updated and unmatched neighbors verbatim.
    Commits as op="update" with predicate + assignments recorded.
    Stream/CDF: raises NonAppendChange without ignore_changes; under
    read_changes the add files are updated rows PLUS survivors of
    the touched files — an apply-by-key consumer gets exact state,
    the same contract as merge.

    ``mode="dv"`` (r11): merge-on-read UPDATE, the deletion-vector
    shape — ONLY the updated rows are written (as fresh files,
    sized by the matched fraction of the touched bytes), and the
    matched rows' OLD positions land in a vector on the otherwise
    untouched originals. Updating 0.1% of the rows of a 100 TB
    table writes ~0.1% of the touched bytes instead of rewriting
    every hit file wholesale. An update that moves a row's
    PARTITION column composes naturally: the new row lands in its
    new directory, the old position is vectored out. Same
    stream/CDF contract — and reading the update window's add
    files (new rows raw, re-adds through their vectors) yields
    updated rows plus survivors, exactly the rewrite-mode feed."""
    from pyspark.sql import functions as F

    if mode not in ("rewrite", "dv"):
        raise ValueError(f"update_where mode={mode!r}: "
                         f"expected 'rewrite' or 'dv'")
    _tz = spark.conf.get("spark.sql.session.timeZone", None)
    for _ in range(max_retries):
        snap = snapshot(root)
        if not snap["files"]:
            return snap["version"]
        cond = F.expr(condition)
        cand = _files_matching_pred(snap, condition, root, spark,
                                    tz=_tz)
        if cand is None:
            cand = sorted(snap["files"])
        if not cand:
            return snap["version"]
        per_cand: dict[str, tuple[int, int]] = {}
        if mode == "dv":
            # fused hit test (r15): one narrow per-file counts scan
            # over the candidates replaces _files_with_hits AND the
            # later per-touched counts job — the dv path needs the
            # (live, hit) counts anyway
            basec = _read_files(spark, root, snap, cand,
                                with_meta=True)
            flagc = cond.isNotNull() & cond
            per_cand = {r[0]: (r[1], r[2]) for r in
                        (basec.groupBy(_DV_FILE)
                         .agg(F.count(F.lit(1)).alias("live"),
                              F.sum(flagc.cast("long")).alias("hit"))
                         .collect())}
            per_cand = {n: (live, hit)
                        for n, (live, hit) in per_cand.items() if hit}
            touched = sorted(p for p in cand
                             if os.path.basename(p) in per_cand)
        else:
            touched = _files_with_hits(spark, root, snap, cand, cond)
        if not touched:
            return snap["version"]
        cur = _read_files(spark, root, snap, touched,
                          with_meta=(mode == "dv"))
        user_cols = [c for c in cur.columns
                     if c not in (_DV_FILE, _DV_POS)]
        unknown = set(assignments) - set(user_cols)
        if unknown:
            raise ValueError(
                f"update_where: SET targets not in the table schema: "
                f"{sorted(unknown)}")
        gen = snap.get("generated") or {}
        gen_hit = set(assignments) & set(gen)
        if gen_hit:
            raise ValueError(
                f"update_where: {sorted(gen_hit)} are GENERATED "
                f"columns — they recompute from their expression "
                f"when source columns update; assign the sources "
                f"instead")
        # the match flag rides in a name no user schema can carry
        # (column names with backticks aside, the uuid suffix makes
        # collision with real data practically impossible)
        flag = f"__txlog_upd_{uuid.uuid4().hex[:8]}"
        flagged = cur.withColumn(flag, cond.isNotNull() & cond)
        sel = []
        for name in user_cols:
            if name in assignments:
                sel.append(
                    F.when(F.col(flag),
                           F.expr(assignments[name])
                           .cast(cur.schema[name].dataType))
                    .otherwise(F.col(name)).alias(name))
            else:
                sel.append(F.col(name))
        pb = snap.get("partition_by")
        if mode == "dv":
            # the fused candidate scan above already counted
            per_file = per_cand
            matched = flagged.where(F.col(flag))
            updated = matched.select(*sel)
            for c, e in gen.items():
                # generated columns recompute on the POST-update row
                updated = updated.withColumn(
                    c, F.expr(e).cast(updated.schema[c].dataType))
            if snap.get("constraints"):
                _check_constraints(updated, snap["constraints"])
            # size the new files by the MATCHED fraction of the
            # touched bytes, not the full touched volume — the
            # whole point of the mode is writing only the updates
            tb = sum(snap["files"][p].get("bytes", 0)
                     * (per_file[os.path.basename(p)][1]
                        / max(per_file[os.path.basename(p)][0], 1))
                     for p in touched)
            n_out = max(1, math.ceil(tb / _MERGE_TARGET_BYTES))
            updated = (updated.repartition(
                n_out, *[F.col(c) for c in pb]) if pb
                else updated.repartition(n_out))
            adds = _stage_write(updated, root, pb,
                                snap.get("colmap"),
                                snap.get("bloom"))
            actions = (_dv_mark_actions(spark, root, snap, touched,
                                        matched, per_file)
                       + [{"add": a} for a in adds])
        else:
            rewritten = flagged.select(*sel, flag)
            for c, e in gen.items():
                rewritten = rewritten.withColumn(
                    c, F.when(F.col(flag), F.expr(e)
                              .cast(rewritten.schema[c].dataType))
                    .otherwise(F.col(c)))
            if snap.get("constraints"):
                _check_constraints(rewritten.where(flag).drop(flag),
                                   snap["constraints"])
            out = _size_merge_output(rewritten.drop(flag), snap,
                                     touched)
            adds = _stage_write(out, root, pb,
                                snap.get("colmap"),
                                snap.get("bloom"))
            actions = ([{"remove": {"path": p}} for p in touched]
                       + [{"add": a} for a in adds])
        entry = {"op": "update", "ts": time.time(),
                 "predicate": condition, "set": dict(assignments),
                 "actions": actions}
        if mode == "dv":
            entry["mode"] = "dv"
            _mark_feature(entry, snap, "deletion-vectors")
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1, checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"update_where lost the snapshot race {max_retries} times "
        f"under {root}")


def overwrite_where(spark, df: DataFrame, root: str, condition: str,
                    max_retries: int = 5,
                    checkpoint_every: int = 10) -> int:
    """Delta's ``replaceWhere``: transactionally replace EXACTLY the
    rows matching ``condition`` with ``df`` — the daily
    partition-reload primitive (re-land one date/tenant slice of a
    100 TB table without touching the rest). File granularity is
    the DML machinery's: stat pruning + one exact hit scan find the
    files holding matching rows; only those are rewritten (their
    non-matching neighbor rows carry as survivors), every other add
    action rides verbatim, and the replacement lands alongside. On
    a hive-partitioned table with a partition-column predicate this
    touches exactly the target partition's files.

    Guards (the Delta contract): every replacement row must satisfy
    ``condition`` (else the "replace" would silently leak rows into
    the untouched scope — refused up front); schema must match the
    table exactly; CHECK constraints validate the replacement. An
    EMPTY ``df`` deletes the scope; a condition matching nothing
    simply lands ``df`` (the scope was empty and is being filled).

    Commits as op="replace" with the predicate recorded. Stream:
    raises NonAppendChange unless ignore_changes (the add files mix
    replacement rows and survivors). read_changes: included by
    default with the same add-files-hold-scope-plus-survivors
    contract as update."""
    from pyspark.sql import functions as F

    _tz = spark.conf.get("spark.sql.session.timeZone", None)
    cond = F.expr(condition)
    os.makedirs(root, exist_ok=True)
    # generated columns apply BEFORE the leak guard: replaceWhere
    # on a generated partition column ("bucket = 3") must see the
    # computed column, not an unresolved reference (code-review r11)
    df = _apply_generated(df, snapshot(root).get("generated") or {})
    if df.where(~cond | cond.isNull()).limit(1).count():
        raise ValueError(
            f"overwrite_where: replacement rows must all satisfy "
            f"{condition!r} (found at least one that does not)")
    for _ in range(max_retries):
        snap = snapshot(root)
        rec = _schema_check(df, snap.get("schema"), False)
        _check_constraints(df, snap.get("constraints", {}))
        cand = (_files_matching_pred(snap, condition, root, spark,
                                     tz=_tz)
                if snap["files"] else [])
        if cand is None:
            cand = sorted(snap["files"])
        touched = _files_with_hits(spark, root, snap, cand, cond) \
            if cand else []
        if touched:
            out = (_read_files(spark, root, snap, touched)
                   .where(~cond | cond.isNull())
                   .unionByName(df))
            out = _size_merge_output(out, snap, touched)
        else:
            out = df
        adds = _stage_write(out, root, snap.get("partition_by"),
                            snap.get("colmap"),
                            snap.get("bloom"))
        entry = {"op": "replace", "ts": time.time(),
                 "predicate": condition,
                 "actions": ([{"remove": {"path": p}}
                              for p in touched]
                             + [{"add": a} for a in adds])}
        if rec is not None:
            entry["schema"] = rec  # creating commit records schema
        if not entry["actions"]:
            return snap["version"]  # empty df into an empty scope
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"overwrite_where lost the snapshot race {max_retries} "
        f"times under {root}")


def optimize(spark, root: str, target_bytes: int = 128 * 1024 * 1024,
             sort_cols: list[str] | None = None,
             zorder: list[str] | None = None,
             where: str | None = None,
             purge: bool = False,
             max_retries: int = 5, checkpoint_every: int = 10) -> int:
    """OPTIMIZE the table as a TRANSACTION — E20's small-file
    compaction running under the commit protocol. FILE-GRANULAR in
    the compaction case: only files under ``target_bytes`` are read
    and re-binned; full-size files keep their add metadata and are
    never opened (a table that is one compaction away from healthy
    doesn't get rewritten wholesale). With ``sort_cols`` the rewrite
    is deliberately GLOBAL — re-clustering is a total re-layout by
    definition (repartitionByRange + in-file sort; output files stay
    range-disjoint so footer pruning keeps working).

    ``zorder`` (r11) is OPTIMIZE ZORDER BY: the listed INTEGRAL
    columns Morton-interleave into one code (layout.py's public bit
    arithmetic — min/max bounds from a single bounded agg, grid
    scaling, n-dim interleave), and the global re-layout
    range-clusters on it — every output file covers a small
    HYPERCUBE of the key space, so footer min/max become tight on
    ALL listed dimensions at once and read_range/read_where prune
    multi-dimensional boxes. Mutually exclusive with ``sort_cols``
    (linear clustering); on a partitioned table the partition
    columns lead the clustering keys in both modes.

    DELETION VECTORS (r11 third stint): any rewritten file
    materializes its vector (the dv-aware read drops deleted rows)
    and loses the ref; plain compaction additionally VOLUNTEERS
    dv-carrying files past a 5% deleted-rows ratio, and
    ``purge=True`` rewrites every vectored file in scope (REORG
    TABLE ... APPLY (PURGE)).

    The swap commits with compare-and-swap against the snapshot
    version, with LOGICAL conflict detection on a lost race (r11
    third stint): interleaved commits that touched NO victim (meta
    equality) commute, and the already-staged entry re-CASes at
    the new head — compaction of a high-ingest table doesn't
    starve behind appends; a changed victim forces the full
    recompute, so readers NEVER see a half-compacted table or a
    resurrected row. Returns the committed version (the current
    version when there was nothing to compact). Small files are
    THE silent scan killer at 100 TB; this is the maintenance job
    that fixes them without closing the table to writers."""
    from pyspark.sql import functions as F

    if sort_cols and zorder:
        raise ValueError("pass sort_cols OR zorder, not both")
    for _ in range(max_retries):
        snap = snapshot(root)
        if not snap["files"]:
            return snap["version"]
        # OPTIMIZE ... WHERE (r11): scope the maintenance to the
        # files the predicate's recognized conjuncts can touch —
        # compact/re-layout one hot partition (or key range) while
        # the rest of a 100 TB table's add actions carry verbatim.
        # The SAME conservative stat analysis as the DML paths: a
        # file that MIGHT match is in scope (it may also hold rows
        # outside the predicate — OPTIMIZE never drops rows, so
        # over-inclusion only widens the rewrite, never the data).
        scope = set(snap["files"])
        if where is not None:
            keep = _files_matching_pred(
                snap, where, root, spark,
                tz=spark.conf.get(
                    "spark.sql.session.timeZone", None))
            if keep is None:
                raise ValueError(
                    f"optimize where={where!r} has no recognizable "
                    f"col-OP-literal conjunct; scoping would "
                    f"silently cover the whole table")
            scope = set(keep)
            if not scope:
                return snap["version"]
        # deletion-vector PURGE rides every rewrite: _read_files
        # anti-joins vectors away, so any file OPTIMIZE touches is
        # re-materialized clean and its dv ref dropped. Plain
        # compaction additionally VOLUNTEERS dv-carrying files once
        # the deleted fraction crosses _DV_PURGE_RATIO (Delta's
        # deletedRowsRatio rule — a file serving mostly-dead rows
        # pays the anti-join on every read), or all of them under
        # purge=True (REORG ... APPLY (PURGE)).
        def _wants_purge(p: str) -> bool:
            m = snap["files"][p]
            if "dv" not in m:
                return False
            if purge:
                return True
            rows = m.get("rows", 0)
            return bool(rows) and (m["dv"].get("deleted", 0)
                                   >= _DV_PURGE_RATIO * rows)

        if sort_cols or zorder:
            victims = sorted(scope)  # scoped re-layout
        else:
            victims = sorted(p for p in scope
                             if snap["files"][p].get("bytes", 0)
                             < target_bytes or _wants_purge(p))
            if not victims or (len(victims) == 1
                               and not _wants_purge(victims[0])):
                return snap["version"]  # nothing worth compacting
        total = sum(snap["files"][p].get("bytes", 0) for p in victims)
        n_out = max(1, math.ceil(total / target_bytes))
        # _read_files: recorded-schema projection + partition-column
        # discovery — a compaction rewrite must not change what a
        # read returns (r11; previously a bare spark.read.parquet)
        df = _read_files(spark, root, snap, victims)
        if zorder:
            from gcp_data_engineering_workshop_spark.sources.layout \
                import interleave_bits_n, scale_to_grid

            for c in zorder:
                t = dict(df.dtypes).get(c)
                if t not in ("tinyint", "smallint", "int", "bigint"):
                    raise ValueError(
                        f"zorder column {c} has type {t}; the Morton "
                        f"grid needs integral columns")
            bits = min(16, 63 // len(zorder))
            r = df.agg(*[f for c in zorder
                         for f in (F.min(c), F.max(c))]).collect()[0]
            scaled = [scale_to_grid(
                F.col(c), int(r[2 * i]), int(r[2 * i + 1]), bits)
                for i, c in enumerate(zorder)]
            zc = f"__txlog_z_{uuid.uuid4().hex[:8]}"
            keys = (snap.get("partition_by") or []) + [zc]
            df = (df.withColumn(zc, interleave_bits_n(scaled, bits))
                  .repartitionByRange(n_out, *[F.col(c) for c in keys])
                  .sortWithinPartitions(*keys)
                  .drop(zc))
        elif sort_cols:
            # on a partitioned table, range-cluster WITHIN the
            # partition columns (prepended to the range keys):
            # ranging on sort_cols alone would hand every task a
            # slice of every partition, and the partitioned writer
            # would fan each task out per value — n_out x partitions
            # files from one re-layout
            keys = ((snap.get("partition_by") or []) + sort_cols)
            df = (df.repartitionByRange(n_out,
                                        *[F.col(c) for c in keys])
                  .sortWithinPartitions(*keys))
        elif snap.get("partition_by"):
            # hash on the partition columns: each hive partition's
            # small files coalesce into ONE task (and the partitioned
            # writer splits colliding partitions back out), instead
            # of a random repartition scattering every partition's
            # rows across n_out bins of fresh small files
            df = df.repartition(
                n_out, *[F.col(c) for c in snap["partition_by"]])
        else:
            df = df.repartition(n_out)
        adds = _stage_write(df, root, snap.get("partition_by"),
                            snap.get("colmap"),
                            snap.get("bloom"))
        entry = {"op": "optimize", "ts": time.time(),
                 "actions": ([{"remove": {"path": p}} for p in victims]
                             + [{"add": a} for a in adds])}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1, checkpoint_every)
            return snap["version"] + 1
        # LOGICAL conflict detection instead of a blind re-run (the
        # Delta OPTIMIZE conflict rule): a re-layout of specific old
        # files COMMUTES with any commit that did not TOUCH one of
        # its victims — concurrent appends (the common case on a
        # busy table) just land alongside. Re-CAS the already-staged
        # entry at the new head; only a commit that touched a victim
        # forces the full recompute. "Touched" is META equality, not
        # path presence: a concurrent dv-delete re-adds the same
        # path with a vector ref, and committing our pre-vector
        # staging over it would resurrect the deleted rows. Without
        # this fast path, compaction of a high-ingest table starves
        # — every append restarts the whole rewrite.
        for _re_cas in range(20):  # bounded like every writer
            head = snapshot(root)
            if any(head["files"].get(p) != snap["files"][p]
                   for p in victims):
                break  # a victim changed: semantic conflict
            if _try_commit(root, head["version"] + 1, entry):
                _maybe_checkpoint(root, head["version"] + 1,
                                  checkpoint_every)
                return head["version"] + 1
    raise CommitConflict(
        f"optimize lost the snapshot race {max_retries} times "
        f"under {root}")


def clone(src_root: str, dst_root: str, version: int | None = None,
          as_of: float | None = None,
          checkpoint_every: int = 10) -> int:
    """SHALLOW CLONE (r11, the Delta CLONE shape): create a NEW
    table at ``dst_root`` whose first commit references the
    source's data files by ABSOLUTE path — zero bytes copied, a
    dev/test copy of a 100 TB table in one metadata commit.
    ``version``/``as_of`` clone a historical snapshot.

    The clone is COPY-ON-WRITE by construction: every DML path
    stages ITS rewrites under the clone's own root and merely drops
    the absolute-path add actions it replaces — the source's files
    are never touched (and the clone's vacuum can never reclaim
    them: its walk sees only clone-root files). Schema and
    constraints carry over; later schema changes on either side are
    independent.

    Caveats, stated like Delta states them: (a) VACUUM ON THE
    SOURCE does not know about clone references — vacuuming source
    history the clone still points at breaks the clone (keep source
    retention >= clone lifetime); (b) partitioned sources refuse —
    Spark's basePath partition discovery needs data under the
    clone's root, which shallow references are not."""
    src = snapshot(src_root, version_at(src_root, as_of)
                   if as_of is not None else version)
    if src.get("partition_by"):
        raise ValueError(
            "shallow clone of a partitioned table is not supported "
            "(partition discovery needs files under the clone root); "
            "copy with overwrite(read(...), dst, partition_by=...)")
    if _list_versions(dst_root):
        raise ValueError(f"clone target {dst_root} already has a log")
    os.makedirs(dst_root, exist_ok=True)
    abs_src = os.path.abspath(src_root)

    def _abs_add(p: str, m: dict) -> dict:
        a = {**m, "path": os.path.join(abs_src, p)}
        if "dv" in m:
            # deletion-vector sidecars are source files too: the
            # clone references them absolutely, reads anti-join
            # them exactly as the source does, and the clone's
            # vacuum can never reclaim them (same walk argument as
            # data files — and the same source-vacuum caveat)
            a["dv"] = {**m["dv"],
                       "path": os.path.join(abs_src, m["dv"]["path"])}
        if "bloom" in m:
            if isinstance(m["bloom"], dict):
                a["bloom"] = {**m["bloom"], "path": os.path.join(
                    abs_src, m["bloom"]["path"])}
            else:
                a["bloom"] = os.path.join(abs_src, m["bloom"])
        return a

    entry = {"op": "clone", "ts": time.time(),
             "source": abs_src, "source_version": src["version"],
             "actions": [
                 {"add": _abs_add(p, m)}
                 for p, m in sorted(src["files"].items())]}
    if src.get("schema"):
        entry["schema"] = src["schema"]
    if src.get("colmap"):
        entry["colmap"] = src["colmap"]
    if src.get("phys_dropped"):
        entry["phys_dropped"] = src["phys_dropped"]
    if src.get("features"):
        entry["features"] = list(src["features"])
    if src.get("generated"):
        entry["generated"] = dict(src["generated"])
    if src.get("bloom"):
        entry["bloom"] = dict(src["bloom"])
    if not _try_commit(dst_root, 1, entry):
        raise CommitConflict(f"clone lost the race for {dst_root}")
    _maybe_checkpoint(dst_root, 1, checkpoint_every)
    v = 1
    for name, expr in sorted(src.get("constraints", {}).items()):
        v += 1
        _try_commit(dst_root, v,
                    {"op": "set-constraint", "ts": time.time(),
                     "name": name, "expr": expr, "actions": []})
    return v


def refresh_incremental(spark, src_root: str, dst_root: str, fn,
                        app_id: str = "incremental",
                        include_ops: tuple = ("append",
                                              "stream-append"),
                        checkpoint_every: int = 10) -> int | None:
    """BATCH-INCREMENTAL refresh (r11): apply ``fn`` to exactly the
    rows that landed in ``src_root`` since this app's last refresh
    and commit the result to ``dst_root`` — the nightly-job analog
    of the streaming medallion hop, exactly-once without a
    streaming query. The cursor is the DESTINATION's txn watermark
    (app_id -> last processed source version), so it rides commits
    and checkpoints like every other piece of table state; a
    re-run after a crash that committed sees the watermark and
    no-ops, a crash before the commit replays the same window onto
    the immutable source log. Returns the destination version
    committed, or None when the source has nothing new.

    ``fn`` receives the read_changes() DataFrame of the window
    (with _commit_version/_commit_op tags; default include_ops
    keeps the exact row-increment ops — appends — and SKIPS
    merge/update/delete/overwrite windows whose add files carry
    survivors; widen include_ops only with apply-by-key logic in
    ``fn``) and returns the rows to append downstream. ``fn`` must
    be deterministic for the exactly-once replay to be exact."""
    head = snapshot(src_root)["version"]
    last = snapshot(dst_root)["txn"].get(app_id, 0)
    if head <= last:
        return None
    delta = read_changes(spark, src_root, from_version=last,
                         to_version=head, include_ops=include_ops)
    out = fn(delta)
    sink = stream_sink(dst_root, app_id=app_id,
                       checkpoint_every=checkpoint_every)
    sink(out, head)  # batch id = src version: idempotent replay
    return snapshot(dst_root)["version"]


def _stamp_txn(root: str, app_id: str, batch_id: int,
               checkpoint_every: int = 10) -> int:
    """Advance an application watermark with a fileless op="txn"
    commit (the exactly-once cursor replicate_incremental and
    replicate_stream ride)."""
    entry = {"op": "txn", "ts": time.time(),
             "app_id": app_id, "batch_id": batch_id, "actions": []}
    for _ in range(20):
        vs = _list_versions(root)
        nv = (vs[-1] if vs else 0) + 1
        if _try_commit(root, nv, entry):
            _maybe_checkpoint(root, nv, checkpoint_every)
            return nv
    raise CommitConflict(
        f"txn watermark stamp lost the version race under {root}")


def replicate_stream(spark, dst_root: str, key: str | list[str],
                     app_id: str = "cdf-replica",
                     checkpoint_every: int = 10):
    """foreachBatch body that turns the txlogcdf streaming source
    into a CONTINUOUS replica (VERDICT r11 #2's composition):

        q = (spark.readStream.format("txlogcdf")
             .option("path", src).load()
             .writeStream.foreachBatch(
                 replicate_stream(spark, dst, "id"))
             .start())

    Each micro-batch's typed rows apply through the same
    latest-change-per-key collapse the batch replicator uses
    (correct across the batch's whole version span — only the
    newest event per key decides final state), as ONE merge_delete
    + ONE merge_upsert. Exactly-once: the destination's txn
    watermark records the applied BATCH id, so Spark's post-crash
    replay of a completed batch no-ops, and a crash mid-batch
    replays merges that converge to the same state (idempotent
    state overwrites). The result table is pytest-pinned equal to
    replicate_incremental's over the same source history."""
    keys = [key] if isinstance(key, str) else list(key)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if snapshot(dst_root)["txn"].get(app_id, -1) >= batch_id:
            return  # replayed completed batch
        _replicate_collapsed(spark, batch_df, dst_root, keys,
                             checkpoint_every)
        _stamp_txn(dst_root, app_id, batch_id, checkpoint_every)
    return _apply


def _merge_apply(spark, root: str, gone: DataFrame, post: DataFrame,
                 keys: list[str], checkpoint_every: int,
                 has_post: bool) -> int:
    """ONE-commit delete+upsert (r15): remove every live row whose
    key matches ``gone`` ∪ ``post``, land the ``post`` rows —
    algebraically identical to merge_delete(gone) followed by
    merge_upsert(post): for a key in both sets the sequential
    delete is undone by the upsert, and both merges find EVERY file
    holding a matching key, so the final row set is

        (live rows with key ∉ gone ∪ post) ∪ post

    either way. The combined form runs ONE file-finding pass, ONE
    read+anti-join+rewrite and ONE commit over the union key set
    instead of two of each. Used by the collapse replication path,
    where the halves always target the same snapshot back-to-back.
    ``has_post`` carries the caller's already-counted gate: with no
    post rows and no touched files the apply is a provable no-op
    and commits nothing (merge_delete's contract)."""
    for _ in range(5):
        snap = snapshot(root)
        if snap.get("schema") is not None and has_post:
            # merge_upsert's strictness: exact schema or refuse
            # (the collapse path never evolves — the replica mirrors
            # the source schema)
            _schema_check(post, snap["schema"], False)
            from pyspark.sql.types import StructType as _ST
            table_cols = {f.name for f in _ST.fromJson(
                json.loads(snap["schema"])).fields}
            narrower = table_cols - set(post.columns)
            if narrower:
                raise SchemaMismatch(
                    f"collapsed apply lacks table columns "
                    f"{sorted(narrower)}")
        _check_constraints(post, snap.get("constraints", {}))
        probe = (gone.select(*keys)
                 .unionByName(post.select(*keys))
                 .dropDuplicates(keys))
        touched = _files_touching_keys(
            spark, snap["files"], probe, keys, root,
            set((snap.get("bloom") or {}).get("cols", [])),
            colmap=snap.get("colmap"),
            types=(_schema_types(snap)
                   if snap.get("partition_by") else None),
            inv=_inv_colmap(snap)) \
            if snap["files"] else []
        if not touched and not has_post:
            return snap["version"]  # provably nothing to delete
        if touched:
            cur = _read_files(spark, root, snap, touched)
            merged = _size_merge_output(
                cur.join(probe, keys, "left_anti")
                .unionByName(post, allowMissingColumns=True),
                snap, touched)
        else:
            merged = post
        adds = _stage_write(merged, root, snap.get("partition_by"),
                            snap.get("colmap"), snap.get("bloom"))
        entry = {"op": "merge", "ts": time.time(),
                 "matched": "apply",
                 "actions": ([{"remove": {"path": p}}
                              for p in touched]
                             + [{"add": a} for a in adds])}
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"collapsed apply lost the snapshot race under {root}")


def _replicate_collapsed(spark, changes: DataFrame, dst_root: str,
                         keys: list[str],
                         checkpoint_every: int) -> None:
    """Apply a multi-version typed change window to a keyed replica
    as ONE delete + ONE upsert (replicate_incremental's long-window
    path). Winner per key = the row with the highest
    (_commit_version, postimage-outranks-preimage): an update commit
    emits both images for an in-place update, and the postimage is
    the final state; a preimage with no postimage for the same key
    at its version means the key MOVED AWAY — a delete. Primary-key
    uniqueness (replicate_incremental's stated contract) guarantees
    at most one postimage per (key, version)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    is_post = F.col("_change_type").isin(
        "insert", "update_postimage").cast("int")
    w = Window.partitionBy(*keys).orderBy(
        F.col("_commit_version").desc(), is_post.desc())
    winners = (changes
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1)
               .drop("_rn")
               .cache())
    try:
        gone = winners.where(~F.col("_change_type").isin(
            "insert", "update_postimage")).select(*keys)
        post = (winners.where(F.col("_change_type").isin(
            "insert", "update_postimage"))
            .drop("_commit_version", "_commit_op", "_change_type"))
        # one counting job decides BOTH merge gates (and warms the
        # winners cache the merges read) — r15: replaces two
        # limit(1).count() jobs whose first run materialized the
        # whole collapse window anyway
        by_kind = {bool(r[0]): r[1] for r in winners.groupBy(
            F.col("_change_type").isin("insert", "update_postimage")
            .alias("_p")).count().collect()}
        if by_kind.get(False, 0) or by_kind.get(True, 0):
            # r15: the delete half and the upsert half apply as ONE
            # combined merge commit — one file-finding pass, one
            # rewrite, one commit over the union key set
            _merge_apply(spark, dst_root, gone, post, keys,
                         checkpoint_every,
                         has_post=bool(by_kind.get(True, 0)))
    finally:
        winners.unpersist()


def replicate_incremental(spark, src_root: str, dst_root: str,
                          key: str | list[str],
                          app_id: str = "replica",
                          checkpoint_every: int = 10,
                          collapse_after: int | None = 8) -> int | None:
    """Exactly-once TABLE REPLICATION over the row-level change feed
    (r11 third stint) — the Delta-docs CDF-replication pattern:
    maintain ``dst_root`` as an exact row-for-row copy of
    ``src_root`` by applying each new source version's typed
    changes as one merge on the destination, in version order:

    - insert / update_postimage rows -> merge_upsert on ``key``;
    - delete rows -> merge_delete on ``key``;
    - update windows whose assignment MOVED a key column: preimage
      keys absent from the postimages are deleted first (otherwise
      the stale row under the old key would survive).

    The cursor is the destination's txn watermark (app_id -> last
    applied source version), the same exactly-once contract as
    refresh_incremental: a crash before the final commit replays
    the same immutable window; versions already at or below the
    watermark re-apply as no-ops because each version is applied
    through idempotent merges against state that already reflects
    it. Requires the source's DML history in the window to be
    append/dv-mode (read_changes_rows' refusal rule carries —
    rewrite-mode commits refuse rather than guess).

    Returns the destination version after the last applied source
    version, or None when the source has nothing new. ``key`` must
    be unique per row in the source for replication to be exact
    (the usual CDC primary-key requirement).

    LONG-WINDOW COLLAPSE (VERDICT r11 #4): the per-version loop runs
    one merge_delete + one merge_upsert Spark-job pair PER source
    version — correct (the changes are order-dependent), but a
    month-long catch-up over a high-commit source is O(versions)
    sequential jobs. For a KEYED replica the standard CDC collapse
    is semantics-preserving: only the LATEST change per key decides
    the final state, so a window longer than ``collapse_after``
    versions first reduces to one winner row per key (rank by
    _commit_version desc, postimages outrank their own version's
    preimages) and applies as exactly ONE merge_delete (keys whose
    latest event is a delete or a moved-away preimage) + ONE
    merge_upsert (keys whose latest event is an insert/postimage) —
    O(1) jobs for any window length, bit-equal to the per-version
    path on the final table (pytested against it on random DML
    histories). Pass ``collapse_after=None`` to force the
    per-version path (e.g. when a downstream audits the replica's
    own commit history per source version)."""
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    head = snapshot(src_root)["version"]
    last = snapshot(dst_root)["txn"].get(app_id, 0)
    if head <= last:
        return None
    changes = read_changes_rows(spark, src_root, from_version=last,
                                to_version=head)
    # ONE aggregate job yields the version list AND per-type counts
    # (r15 optimization: the per-version loop formerly ran a
    # versions-distinct collect plus TWO gating limit(1).count()
    # jobs per version — the "gone" gate alone planned the
    # preimage anti-join, ~6 AQE jobs and ~1 s per version at
    # bench scale, all to decide whether a merge would be empty.
    # The decisions below are bit-equivalent: post is nonempty iff
    # n_insert + n_postimage > 0; gone = dels ∪ moved is nonempty
    # iff n_delete > 0 or some preimage key has no postimage in
    # its version — the latter checked by ONE window-wide anti-join
    # job, and only when any version carries preimages at all.)
    cnt: dict[tuple[int, str], int] = {
        (r[0], r[1]): r[2]
        for r in changes.groupBy("_commit_version", "_change_type")
        .count().collect()}
    versions = sorted({v for v, _t in cnt})
    if collapse_after is not None and len(versions) > collapse_after:
        _replicate_collapsed(spark, changes, dst_root, keys,
                             checkpoint_every)
        versions = []
    moved_versions: set[int] = set()
    if versions and any(cnt.get((v, "update_preimage"), 0)
                        for v in versions):
        pre_all = changes.where(
            F.col("_change_type") == "update_preimage") \
            .select("_commit_version", *keys)
        post_all = changes.where(
            F.col("_change_type").isin("insert",
                                       "update_postimage")) \
            .select("_commit_version", *keys)
        moved_versions = {
            r[0] for r in pre_all
            .join(post_all, ["_commit_version"] + keys, "left_anti")
            .select("_commit_version").distinct().collect()}
    out = None
    for v in versions:
        need_delete = (cnt.get((v, "delete"), 0) > 0
                       or v in moved_versions)
        need_upsert = (cnt.get((v, "insert"), 0)
                       + cnt.get((v, "update_postimage"), 0)) > 0
        if not (need_delete or need_upsert):
            continue
        win = changes.where(F.col("_commit_version") == v).cache()
        try:
            dels = win.where(F.col("_change_type") == "delete") \
                .select(*keys)
            pre = win.where(
                F.col("_change_type") == "update_preimage") \
                .select(*keys)
            post = win.where(
                F.col("_change_type").isin("insert",
                                           "update_postimage")) \
                .drop("_commit_version", "_commit_op",
                      "_change_type")
            moved = pre.join(post.select(*keys), keys, "left_anti")
            gone = dels.unionByName(moved)
            if need_delete:
                merge_delete(spark, dst_root, gone, keys,
                             checkpoint_every=checkpoint_every)
            if need_upsert:
                merge_upsert(spark, dst_root, post, keys,
                             checkpoint_every=checkpoint_every)
        finally:
            win.unpersist()
    # stamp the watermark with a fileless txn commit so a re-run
    # (or an all-no-op window) still advances exactly once
    out = _stamp_txn(dst_root, app_id, head, checkpoint_every)
    return out


def stream_sink(root: str, app_id: str = "stream",
                checkpoint_every: int = 10,
                auto_optimize_every: int = 0,
                optimize_target_bytes: int = 128 * 1024 * 1024):
    """Exactly-once streaming sink INTO the transaction log: a
    foreachBatch function that appends each micro-batch as one
    commit CARRYING ITS BATCH ID — on failure/restart Spark replays
    the last batch, and the replayed append sees its batchId already
    recorded and becomes a no-op. This is the sink-side idempotence
    the file-sink manifest gives the built-in sinks, rebuilt on the
    commit log (and it composes with everything else here: the
    landed data is snapshot-isolated, time-travelable, optimizable).

    The idempotence check reads the snapshot's ``txn`` watermark
    (per-app max committed batch id, maintained by the same
    checkpoint-plus-suffix replay every reader uses) — O(suffix)
    commit files per micro-batch, NOT O(all commits ever) (the r8
    version opened every version JSON — VERDICT r8 What's-wrong
    #2). Batch ids are monotone per query, so watermark >= batchId
    means "already landed".

    ``auto_optimize_every=N`` (r12, Delta's autoCompact shape): a
    continuous stream lands one small-file commit per micro-batch
    forever; every Nth batch the sink folds them with a
    transactional OPTIMIZE after its append commits — downstream
    streams skip the optimize commit (dataChange=false), replayed
    batches no-op before it, and the file count stays ~bounded
    instead of growing one file per trigger per partition.

    Usage: ``stream.writeStream.foreachBatch(stream_sink(root))``.
    """

    def _sink(batch_df, batch_id: int) -> None:
        snap0 = snapshot(root)
        if snap0["txn"].get(app_id, -1) >= batch_id:
            return  # replayed micro-batch: already committed
        batch_df = _apply_generated(batch_df,
                                    snap0.get("generated") or {})
        rec = _schema_check(batch_df, snap0.get("schema"), False)
        _check_constraints(batch_df, snap0.get("constraints", {}))
        adds = _stage_write(batch_df, root,
                            snap0.get("partition_by"),
                            snap0.get("colmap"),
                            snap0.get("bloom"))
        entry = {"op": "stream-append", "ts": time.time(),
                 "app_id": app_id, "batch_id": batch_id,
                 "actions": [{"add": a} for a in adds]}
        if rec is not None:
            entry["schema"] = rec
        for attempt in range(20):
            if attempt and snapshot(root)["txn"].get(
                    app_id, -1) >= batch_id:
                # a concurrent instance of the same app_id (driver
                # failover / zombie run) won the race we just lost
                # and already landed this batchId — committing again
                # would break exactly-once
                return
            head = _list_versions(root)
            v = (head[-1] if head else 0) + 1
            if _try_commit(root, v, entry):
                _maybe_checkpoint(root, v, checkpoint_every)
                # AUTO-COMPACTION (r12, Delta's autoCompact): a
                # long-running stream lands one small-file commit
                # per micro-batch; every Nth batch folds them with
                # a transactional OPTIMIZE (its own dataChange=false
                # commit — downstream streams skip it, replays just
                # find already-compacted files and no-op the batch
                # BEFORE this point). Failures don't poison the
                # batch: the data is committed either way — a
                # transient optimize error (e.g. CommitConflict
                # after losing version races) must not raise out of
                # foreachBatch and fail a micro-batch whose data
                # already landed.
                if auto_optimize_every and \
                        batch_id % auto_optimize_every == \
                        auto_optimize_every - 1:
                    try:
                        optimize(batch_df.sparkSession, root,
                                 target_bytes=optimize_target_bytes,
                                 checkpoint_every=checkpoint_every)
                    except Exception as e:
                        # TRANSIENT classes only (ADVICE r14 + the
                        # code-review follow-up): a lost version
                        # race, an fs hiccup, or a failed Spark
                        # compaction JOB (executor loss, shuffle
                        # fetch, vacuum race -> Py4JJavaError)
                        # retries at the next Nth batch — logged,
                        # so compaction silently stopping leaves a
                        # signal. Python-side engine bugs MUST
                        # surface (a blanket swallow here once hid
                        # a TypeError for a full round).
                        try:
                            from py4j.protocol import Py4JJavaError
                        except ImportError:  # pragma: no cover
                            Py4JJavaError = ()
                        if not isinstance(
                                e, (CommitConflict, OSError,
                                    Py4JJavaError)):
                            raise
                        import logging
                        logging.getLogger(__name__).warning(
                            "auto-optimize skipped at batch %s "
                            "under %s: %s", batch_id, root, e)
                return
        raise CommitConflict(f"stream batch {batch_id} lost the "
                             f"version race under {root}")

    return _sink


def vacuum(root: str, retention_seconds: float = 3600.0,
           dry_run: bool = False) -> list[str]:
    """Delete data files that are (a) referenced by NO reachable log
    entry and (b) older than ``retention_seconds`` (mtime). The
    retention window is the race guard: a concurrent writer's staged
    files are always younger than it, so vacuum can run alongside
    live commits without eating a commit-in-flight's data (the r8
    version could — ADVICE r8). Tests pass retention_seconds=0 to
    make cleanup immediate in a single-writer world.

    The reference scan reads the newest checkpoint plus the log
    SUFFIX after it — the same O(suffix) bound snapshot() enjoys —
    rather than replaying every commit ever. Consequence (identical
    to the paper's VACUUM): once a checkpoint exists, files that
    were removed BEFORE it and have aged past retention are
    reclaimed, so deep time travel is bounded by (checkpoint,
    retention); files still live at the checkpoint, added after it,
    or younger than retention always survive.

    ``dry_run=True`` (r11) returns exactly what a real run would
    remove, deleting nothing — the look-before-you-leap a table
    owner runs before giving up time-travel history."""
    referenced: set[str] = set()
    dv_dirs: set[str] = set()  # referenced deletion-vector sidecars
    start = 0
    for c in reversed(_list_checkpoints(root)):
        loaded = _load_checkpoint(root, c)
        if loaded is None:
            continue  # torn checkpoint: fall back to an older one
        _cpm, cpfiles = loaded
        # columnar checkpoints iterate off the arrow buffers; bloom
        # and dv refs live inside the meta JSON either way
        for p, m in cpfiles.items():
            referenced.add(p)
            if "bloom" in m:
                ref = m["bloom"]
                referenced.add(ref["path"]
                               if isinstance(ref, dict) else ref)
            if "dv" in m:
                dv_dirs.add(m["dv"]["path"])
        start = c
        break
    for v in _list_versions(root):
        if v <= start:
            continue
        e = json.load(open(_version_file(root, v)))
        for a in e["actions"]:
            if "add" in a:
                referenced.add(a["add"]["path"])
                if "bloom" in a["add"]:
                    ref = a["add"]["bloom"]
                    referenced.add(ref["path"]
                                   if isinstance(ref, dict) else ref)
                if "dv" in a["add"]:
                    dv_dirs.add(a["add"]["dv"]["path"])
    now = time.time()
    removed = []
    # recursive walk (r11): partitioned tables nest data files under
    # hive-style col=value dirs; crashed writers also strand whole
    # _stage-* dirs, reclaimed under the same mtime retention guard.
    # Deletion-vector sidecar dirs (_dv/dv-*) vacuum as units: their
    # parquet parts survive while ANY reachable add action points at
    # the dir, and age out under the same (checkpoint, retention)
    # bound as data files once every referencing add is rewritten.
    for dirpath, dirs, files in os.walk(root):
        if os.path.basename(dirpath) == LOG_DIR:
            dirs[:] = []
            continue
        rel_dir = os.path.relpath(dirpath, root)
        for f in files:
            is_bloom = (rel_dir == _BLOOM_DIR
                        and f.endswith(".json"))
            if not f.endswith(".parquet") and not is_bloom:
                continue
            rel = (f if rel_dir == "." else
                   "/".join([rel_dir.replace(os.sep, "/"), f]))
            if rel in referenced or any(
                    rel.startswith(d + "/") for d in dv_dirs):
                continue
            p = os.path.join(dirpath, f)
            if now - os.path.getmtime(p) >= retention_seconds:
                if not dry_run:
                    os.remove(p)
                removed.append(rel)
    # prune now-empty partition/stage dirs (bottom-up; ignore the
    # root and anything a concurrent writer just created)
    if not dry_run:
        for dirpath, _dirs, files in sorted(
                os.walk(root), key=lambda t: -len(t[0])):
            if dirpath == root or LOG_DIR in dirpath.split(os.sep):
                continue
            try:
                os.rmdir(dirpath)  # fails (kept) unless empty
            except OSError:
                pass
    # orphaned commit temp files (ADVICE r9): a writer crashing
    # between writing tmp-*.part and os.link() leaves the temp in
    # _txlog forever — _list_versions skips it, but nothing else
    # reclaimed it. Same mtime retention guards an in-flight commit.
    log_dir = _log_path(root)
    if os.path.isdir(log_dir):
        for f in os.listdir(log_dir):
            # tmp-*.part: crashed commit temps; *.tmp-*: crashed
            # checkpoint temps (json or files.parquet)
            if not ((f.startswith("tmp-") and f.endswith(".part"))
                    or ".tmp-" in f):
                continue
            p = os.path.join(log_dir, f)
            if now - os.path.getmtime(p) >= retention_seconds:
                if not dry_run:
                    os.remove(p)
                removed.append(os.path.join(LOG_DIR, f))
    return sorted(removed)


def restore(root: str, version: int | None = None,
            max_retries: int = 5, checkpoint_every: int = 10,
            spark=None, as_of: float | None = None) -> int:
    """RESTORE the table to a historical version — as a NEW commit
    (Delta's RESTORE semantics: the rollback is itself logged, so
    it is auditable, time-travelable past, and CAS-serialized with
    concurrent writers; nothing is rewritten — the commit just
    re-points the live set at version N's files, which survive on
    disk as long as vacuum retention allows). The recorded schema
    rolls back with it. Raises if any of version N's files has
    already been vacuumed (a deep restore past retention is the
    same impossibility as a deep time-travel read).

    Constraints do NOT roll back (like the schema they are replayed
    metadata, but set-/drop-constraint commits stay in the log) —
    so restored data may predate a live constraint. Pass ``spark``
    to RETRO-VALIDATE version N's content against the constraints
    live at the head before committing (one bounded scan, the same
    contract as add_constraint); without it, restore trusts history
    (ADVICE r10, documented tradeoff).

    ``as_of`` (r11): restore to the newest version committed at or
    before a unix timestamp (TIMESTAMP AS OF, via version_at) —
    "roll back to how the table looked at 9am"."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version OR as_of, not both")
        version = version_at(root, as_of)
    if version is None:
        raise ValueError("restore needs version or as_of")
    target = snapshot(root, version)
    missing = [p for p in target["files"]
               if not os.path.exists(os.path.join(root, p))]
    missing += sorted({m["dv"]["path"]
                       for m in target["files"].values()
                       if "dv" in m and not os.path.exists(
                           os.path.join(root, m["dv"]["path"]))})
    if missing:
        raise ValueError(
            f"restore({version}): {len(missing)} data file(s) "
            f"already vacuumed, e.g. {missing[0]}")
    if spark is not None:
        _check_constraints(read(spark, root, version),
                           snapshot(root).get("constraints", {}))
    for _ in range(max_retries):
        snap = snapshot(root)
        # re-add on META inequality, not just path absence: a
        # deletion-vector delete re-commits the SAME path with a
        # different add action, so restoring across one must roll
        # the dv ref back (or forward) even though the path never
        # changed — path-presence diffing would silently keep the
        # head's vector state
        entry = {"op": "restore", "ts": time.time(),
                 "restored_version": version,
                 "actions": ([{"remove": {"path": p}}
                              for p in sorted(snap["files"])
                              if p not in target["files"]]
                             + [{"add": a} for p, a in
                                sorted(target["files"].items())
                                if snap["files"].get(p) != a])}
        if target.get("schema"):
            entry["schema"] = target["schema"]
        # the COLUMN MAPPING rolls back with the schema (r11 third
        # stint): a restore across a rename/drop must re-point the
        # logical names at the same eternal physical columns
        entry["colmap"] = target.get("colmap", {})
        entry["phys_dropped"] = target.get("phys_dropped", [])
        entry["generated"] = target.get("generated", {})
        entry["bloom"] = target.get("bloom", {})
        # the PARTITION SPEC rolls back with the files (r11): a
        # restore past a re-partitioning overwrite re-points the
        # live set at old-layout files — leaving the head's spec in
        # place would make every reader interpret them through the
        # wrong directory contract. Always recorded (even []) so an
        # un-partitioned target resets a partitioned head.
        entry["partition_by"] = target.get("partition_by", [])
        if snapshot(root)["version"] == snap["version"] and \
                _try_commit(root, snap["version"] + 1, entry):
            _maybe_checkpoint(root, snap["version"] + 1,
                              checkpoint_every)
            return snap["version"] + 1
    raise CommitConflict(
        f"restore lost the snapshot race {max_retries} times "
        f"under {root}")


def _feed_read_maps(root: str, versions: list[int],
                    end_snap: dict) -> dict[int, dict]:
    """Per-version {end-logical: physical} column maps for reading
    each window commit's add files in the window-END schema.

    Within one colmap EPOCH (between overwrites) the epoch-end
    colmap covers files of every age: physical names never change,
    renames move only the logical side, and a drop/re-add assigns a
    fresh physical so old bytes can't alias. A full OVERWRITE resets
    the mapping AND the physical naming domain (its files land
    logical==physical), so one map cannot cover files on both sides
    — pre-overwrite files of a previously-renamed table read through
    the post-overwrite (empty) map surfaced NULLs (ADVICE r12). The
    walk goes DOWN from the window end: end-logical names are
    rename-traced to each overwrite boundary, where the map re-bases
    onto the PRE-overwrite snapshot's colmap — column identity
    crosses a full replace by logical name, the only identity an
    overwrite preserves. (A RESTORE commit inside a widened
    include_ops window is not specially traced: restore re-points at
    existing files whose physical domain the restored colmap already
    covers, and the row feed refuses restore outright.)"""
    if not versions:
        return {}
    end_cmap = end_snap.get("colmap") or {}
    schema_json = end_snap.get("schema")
    if not schema_json:
        return {v: dict(end_cmap) for v in versions}
    names = [f["name"]
             for f in json.loads(schema_json)["fields"]]
    name_at = {n: n for n in names}  # end logical -> logical at age
    seg_map: dict | None = None      # None => newest epoch
    maps: dict[int, dict] = {}
    for v in sorted(versions, reverse=True):
        maps[v] = dict(end_cmap if seg_map is None else seg_map)
        try:
            e = json.load(open(_version_file(root, v)))
        except OSError:
            continue
        op = e.get("op")
        if op == "rename-column" and "old" in e and "new" in e:
            old, new = e["old"], e["new"]
            name_at = {L: (old if n == new else n)
                       for L, n in name_at.items()}
        elif op == "overwrite":
            pcm = (snapshot(root, v - 1).get("colmap") or {}) \
                if v > 1 else {}
            seg_map = {L: pcm.get(n, n)
                       for L, n in name_at.items()}
    return maps


def read_changes(spark, root: str, from_version: int | None = None,
                 to_version: int | None = None,
                 include_ops: tuple = ("append", "stream-append",
                                       "merge", "overwrite",
                                       "update", "delete", "clone",
                                       "replace"),
                 from_ts: float | None = None,
                 to_ts: float | None = None) -> DataFrame:
    """Incremental (change-feed) read: the rows committed in
    versions (``from_version``, ``to_version``] — the downstream
    consumer's "what landed since my last checkpoint" question,
    answered from the log without rescanning the table (the
    file-level slice of the Delta paper's CDF idea).

    Semantics are FILE-level, stated honestly per op:
    - append / stream-append: exact row-level increments (every row
      in the commit's add files is new).
    - merge: the commit's add files hold the updates PLUS the
      surviving rows of rewritten files — consumers treating the
      feed as an upsert stream (apply by key, the way CDF consumers
      do) get exactly-correct state; row-level "only what changed"
      would need row tracking this format doesn't carry.
    - overwrite: a full snapshot-replace; the add files ARE the new
      table.
    - update (r11): same shape as merge — the add files hold the
      UPDATED rows plus the survivors of the rewritten files;
      apply-by-key consumers get exact state.
    - delete (r11): the add files hold SURVIVORS only (the deleted
      keys simply stop appearing) — same caveat merge_delete's
      op="merge" commits carry. Row-level delete tombstones need
      row tracking — which dv-mode DML provides: for windows of
      appends + deletion-vector commits, read_changes_rows()
      emits the exact deleted/updated rows with Delta-CDF
      _change_type tags.
    - optimize: EXCLUDED by default — a pure re-layout commits no
      data change, and replaying it would duplicate every row of
      the compacted files downstream.

    Each row is tagged with _commit_version and _commit_op so a
    consumer can branch on the semantics above. Files are read even
    if a LATER commit removed them (their content was committed in
    the window; vacuum retention is the same time-travel bound
    read() has). Cost: O(versions in window) log-file reads plus a
    scan of exactly the window's add files — never the table.

    TIMESTAMP bounds (r11): pass ``from_ts``/``to_ts`` (unix
    seconds) instead of versions — each resolves through
    version_at's "newest version at or before the instant" rule,
    so (from_ts, to_ts] means "what landed after from_ts, up to
    to_ts". Mixing a version and a timestamp for the SAME bound
    refuses."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if from_ts is not None:
        if from_version is not None:
            raise ValueError("pass from_version OR from_ts, not both")
        from_version = version_at(root, from_ts)
    if from_version is None:
        raise ValueError("read_changes needs from_version or from_ts")
    if to_ts is not None:
        if to_version is not None:
            raise ValueError("pass to_version OR to_ts, not both")
        to_version = version_at(root, to_ts)
    versions = [v for v in _list_versions(root)
                if v > from_version
                and (to_version is None or v <= to_version)]
    # the feed surfaces in ONE shape: the schema as of the window's
    # END — rows committed before an evolved column arrive with
    # NULL for it (the same projection read() applies), so the
    # union below never sees ragged parts. Column-mapped tables
    # read each commit's files through a PER-VERSION map
    # (_feed_read_maps): within an epoch that's just the end
    # snapshot's colmap, but an overwrite inside the window resets
    # the mapping and older files need their own epoch's map
    # (ADVICE r12).
    end_snap = snapshot(root, to_version)
    end_schema = end_snap.get("schema")
    read_maps = _feed_read_maps(root, versions, end_snap)
    parts = []
    for v in versions:
        e = json.load(open(_version_file(root, v)))
        if e["op"] not in include_ops:
            continue
        rels = [a["add"]["path"] for a in e["actions"] if "add" in a]
        if not rels:
            continue
        # _read_paths_at: hive rel paths go through basePath
        # discovery, absolute paths are shallow-clone references,
        # physical columns alias to the logical schema
        part = _read_paths_at(spark, root, rels, end_schema,
                              colmap=read_maps.get(v))
        # merge-on-read delete (dv mode): the commit's add files are
        # the ORIGINAL bytes re-committed with a deletion-vector
        # ref — project through the commit's OWN vectors so the
        # feed's survivors-only delete contract stays exact
        dvm = {os.path.basename(a["add"]["path"]): a["add"]["dv"]
               for a in e["actions"]
               if "add" in a and "dv" in a["add"]}
        if dvm:
            part = part.select(
                "*",
                F.col("_metadata.file_name").alias(_DV_FILE),
                F.col("_metadata.row_index").alias(_DV_POS))
            dv = _dv_table(spark, root, dvm)
            part = (part.join(dv, (part[_DV_FILE] == dv["file"])
                              & (part[_DV_POS] == dv["pos"]),
                              "left_anti")
                    .drop(_DV_FILE, _DV_POS))
        parts.append(
            part
            .withColumn("_commit_version", F.lit(v))
            .withColumn("_commit_op", F.lit(e["op"])))
    if not parts:
        return (read(spark, root)
                .limit(0)
                .withColumn("_commit_version",
                            F.lit(None).cast("int"))
                .withColumn("_commit_op",
                            F.lit(None).cast("string")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_paths_at(spark, root: str, rels: list[str],
                   schema_json: str | None,
                   with_meta: bool = False,
                   colmap: dict | None = None) -> DataFrame:
    """Read specific (possibly since-removed) files through an
    explicit schema — the read_changes file-reader shape factored
    for the change feeds: hive-layout rel paths go through
    basePath discovery, absolute paths are clone references,
    ``with_meta`` appends the (_DV_FILE, _DV_POS) provenance
    columns the vector joins key on, and ``colmap`` translates the
    files' physical column names to the logical schema (column
    mapping — physical names never change, so one snapshot's map
    reads files of every age)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    cmap = colmap or {}
    rdr = spark.read
    partitioned = any("/" in p and not os.path.isabs(p)
                      for p in rels)
    if partitioned:
        rdr = rdr.option("basePath", root)
    paths = [os.path.join(root, p) for p in rels]
    if schema_json:
        lst = StructType.fromJson(json.loads(schema_json))
        pst = StructType(
            [StructField(cmap.get(f.name, f.name), f.dataType,
                         f.nullable) for f in lst.fields]) \
            if cmap else lst
        out = rdr.schema(pst).parquet(*paths)
        pairs = [(cmap.get(f.name, f.name), f.name)
                 for f in lst.fields]
    else:
        out = rdr.parquet(*paths)
        pairs = [(c, c) for c in out.columns]
    mapped = any(p != n for p, n in pairs)
    sel = [F.col(p).alias(n) if p != n else F.col(n)
           for p, n in pairs]
    if with_meta:
        out = out.select(
            *sel,
            F.col("_metadata.file_name").alias(_DV_FILE),
            F.col("_metadata.row_index").alias(_DV_POS))
    elif mapped or (partitioned and schema_json):
        out = out.select(*sel)
    return out


def read_changes_rows(spark, root: str,
                      from_version: int | None = None,
                      to_version: int | None = None,
                      from_ts: float | None = None,
                      to_ts: float | None = None) -> DataFrame:
    """ROW-LEVEL change feed (r11 third stint) — the Delta CDF
    `_change_type` contract, reconstructable because deletion
    vectors ARE row tracking for the rows they cover. For versions
    (from, to], emits one row per actual row-level change, tagged
    `_change_type` (plus the usual _commit_version/_commit_op):

    - append / stream-append / clone: every added row, "insert".
    - dv-mode DELETE / MERGE-DELETE: exactly THIS commit's deleted
      rows, "delete" — the commit's cumulative vector minus the
      previous version's (a strict superset by construction), plus
      every live row of files the commit dropped outright. No
      survivors are re-emitted — this is the row-level exactness
      the file-level read_changes() documents as out of reach for
      rewrite commits.
    - dv-mode UPDATE: the old images of updated rows
      ("update_preimage", from the newly vectored positions) and
      the new images ("update_postimage", the commit's fresh
      vector-free files).
    - optimize / constraint commits: nothing (dataChange=false).
    - rewrite-mode merge/update/delete, overwrite, restore: RAISE —
      a rewrite mixes changed and carried rows indistinguishably,
      so row-level typing would be a guess; use the file-level
      read_changes() (documented survivors contracts) or run DML
      in mode="dv".

    Rows surface in the schema AS OF the window end, like
    read_changes. Cost: O(window) log reads + one scan of each dv
    commit's touched files and each append's add files."""
    from pyspark.sql import functions as F

    if from_ts is not None:
        if from_version is not None:
            raise ValueError("pass from_version OR from_ts, not both")
        from_version = version_at(root, from_ts)
    if from_version is None:
        raise ValueError(
            "read_changes_rows needs from_version or from_ts")
    if to_ts is not None:
        if to_version is not None:
            raise ValueError("pass to_version OR to_ts, not both")
        to_version = version_at(root, to_ts)
    versions = [v for v in _list_versions(root)
                if v > from_version
                and (to_version is None or v <= to_version)]
    _end = snapshot(root, to_version)
    end_schema = _end.get("schema")
    read_maps = _feed_read_maps(root, versions, _end)

    def _tag(df, v, op, ct):
        return (df.withColumn("_commit_version", F.lit(v))
                .withColumn("_commit_op", F.lit(op))
                .withColumn("_change_type", F.lit(ct)))

    parts = []
    # r16 (VERDICT r15 #8): dv-free insert commits (append /
    # stream-append / dv-less clone) batch into ONE scan per colmap
    # epoch instead of one scan per version — _commit_version /
    # _commit_op re-attach per FILE from the commit log (file names
    # are uuid-unique), so the rows are identical to the per-version
    # reads. dv-bearing clones keep the per-version path (their
    # anti-join is version-specific).
    ins_batches: dict[tuple, list] = {}
    for v in versions:
        e = json.load(open(_version_file(root, v)))
        op = e["op"]
        if op in ("optimize", "bloom-backfill"):
            continue  # dataChange=false
        adds = [a["add"] for a in e["actions"] if "add" in a]
        removes = [a["remove"]["path"] for a in e["actions"]
                   if "remove" in a]
        if op in ("append", "stream-append", "clone"):
            if not adds:
                continue
            if any("dv" in a for a in adds):
                ins = _read_paths_at(
                    spark, root, [a["path"] for a in adds],
                    end_schema, with_meta=True,
                    colmap=read_maps.get(v))
                # a CLONE of a dv-bearing table references the
                # source's vectored files: its "inserts" are the
                # LIVE rows, not the raw bytes (code-review r11:
                # the raw read resurrected deleted rows)
                dvm = {os.path.basename(a["path"]): a["dv"]
                       for a in adds if "dv" in a}
                dvt = _dv_table(spark, root, dvm)
                ins = (ins.join(
                    dvt, (ins[_DV_FILE] == dvt["file"])
                    & (ins[_DV_POS] == dvt["pos"]), "left_anti")
                    .drop(_DV_FILE, _DV_POS))
                parts.append(_tag(ins, v, op, "insert"))
                continue
            key = tuple(sorted((read_maps.get(v) or {}).items()))
            ins_batches.setdefault(key, []).append(
                (v, op, [a["path"] for a in adds]))
            continue
        if e.get("mode") != "dv":
            if not adds and not removes:
                continue  # fileless (constraints etc.)
            raise ValueError(
                f"read_changes_rows: version {v} is a {op} commit "
                f"without deletion vectors; row-level change typing "
                f"is only exact for dv-mode DML — use read_changes "
                f"for the file-level feed")
        # dv commit: vectored re-adds + (update only) fresh files
        prev = snapshot(root, v - 1)
        pre_ct = ("update_preimage" if op == "update" else "delete")
        dv_adds = {a["path"]: a for a in adds if "dv" in a}
        fresh = [a["path"] for a in adds if "dv" not in a]
        if dv_adds:
            new_refs = {os.path.basename(p): a["dv"]
                        for p, a in dv_adds.items()}
            newly = _dv_table(spark, root, new_refs, for_join=False)
            prev_refs = _dv_refs(prev["files"], list(dv_adds))
            if prev_refs:
                pd = _dv_table(spark, root, prev_refs,
                               for_join=False)
                newly = newly.join(
                    pd, (newly["file"] == pd["file"])
                    & (newly["pos"] == pd["pos"]), "left_anti")
            rows = _read_paths_at(spark, root, sorted(dv_adds),
                                  end_schema, with_meta=True,
                                  colmap=read_maps.get(v))
            nw = newly
            if sum(r.get("deleted", 0) for r in new_refs.values()) \
                    <= _DV_BROADCAST_BOUND:
                nw = F.broadcast(newly)
            rows = (rows.join(nw, (rows[_DV_FILE] == nw["file"])
                              & (rows[_DV_POS] == nw["pos"]),
                              "left_semi")
                    .drop(_DV_FILE, _DV_POS))
            parts.append(_tag(rows, v, op, pre_ct))
        dropped = [p for p in removes if p not in dv_adds]
        if dropped:
            # files the commit removed outright: every LIVE row (as
            # of v-1) was deleted/updated this commit
            rows = _read_paths_at(spark, root, sorted(dropped),
                                  end_schema, with_meta=True,
                                  colmap=read_maps.get(v))
            prev_refs = _dv_refs(prev["files"], dropped)
            if prev_refs:
                pd = _dv_table(spark, root, prev_refs)
                rows = rows.join(
                    pd, (rows[_DV_FILE] == pd["file"])
                    & (rows[_DV_POS] == pd["pos"]), "left_anti")
            parts.append(_tag(rows.drop(_DV_FILE, _DV_POS),
                              v, op, pre_ct))
        if fresh:
            parts.append(_tag(_read_paths_at(
                spark, root, sorted(fresh), end_schema,
                colmap=read_maps.get(v)), v, op, "update_postimage"))
    for key, group in ins_batches.items():
        cmap = dict(key) or None
        if len(group) == 1:
            v, op, ps = group[0]
            parts.append(_tag(_read_paths_at(
                spark, root, ps, end_schema, colmap=cmap),
                v, op, "insert"))
            continue
        vmap: dict[str, int] = {}
        omap: dict[str, str] = {}
        for v, op, ps in group:
            for p in ps:
                bn = os.path.basename(p)
                vmap[bn] = v
                omap[bn] = op
        if len(vmap) != sum(len(ps) for _v, _op, ps in group):
            # two versions reference a same-named file (e.g. the
            # same source file cloned twice) — per-file tagging
            # would be ambiguous; fall back to per-version scans
            for v, op, ps in group:
                parts.append(_tag(_read_paths_at(
                    spark, root, ps, end_schema, colmap=cmap),
                    v, op, "insert"))
            continue
        ins = _read_paths_at(
            spark, root,
            [p for _v, _op, ps in group for p in ps],
            end_schema, with_meta=True, colmap=cmap)
        vexpr = F.create_map(*[F.lit(x) for bn, vv in vmap.items()
                               for x in (bn, vv)])[F.col(_DV_FILE)]
        oexpr = F.create_map(*[F.lit(x) for bn, oo in omap.items()
                               for x in (bn, oo)])[F.col(_DV_FILE)]
        parts.append(
            ins.withColumn("_commit_version", vexpr.cast("int"))
               .withColumn("_commit_op", oexpr)
               .withColumn("_change_type", F.lit("insert"))
               .drop(_DV_FILE, _DV_POS))
    if not parts:
        return (read(spark, root)
                .limit(0)
                .withColumn("_commit_version",
                            F.lit(None).cast("int"))
                .withColumn("_commit_op", F.lit(None).cast("string"))
                .withColumn("_change_type",
                            F.lit(None).cast("string")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------- #
# streaming SOURCE from the table (readStream twin of stream_sink)
# ---------------------------------------------------------------- #


def _pa_to_ddl(path: str) -> str:
    """Spark DDL for the table's row schema, from one live parquet
    FOOTER (no data read) — primitive top-level columns, the same
    subset the rest of this module's stats machinery handles."""
    import pyarrow.parquet as pq

    _MAP = {"int8": "tinyint", "int16": "smallint", "int32": "int",
            "int64": "bigint", "float": "float", "double": "double",
            "string": "string", "large_string": "string",
            "bool": "boolean", "binary": "binary",
            "date32[day]": "date"}
    sch = pq.ParquetFile(path).schema_arrow
    parts = []
    for f in sch:
        t = str(f.type)
        if t.startswith("timestamp"):
            ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
        elif t in _MAP:
            ddl = _MAP[t]
        else:
            raise ValueError(
                f"txlogstream: unsupported column type {t} "
                f"for field {f.name}")
        parts.append(f"{f.name} {ddl}")
    return ", ".join(parts)


class NonAppendChange(Exception):
    """The stream hit a merge/overwrite/restore commit without
    ignore_changes=true — emitting its files would re-send rows
    that were UPDATES (or resurrected history) downstream as if
    they were inserts."""


def _plan_window(root: str, lo: int, hi: int,
                 ignore_changes: bool) -> list[tuple[int, str, list]]:
    """The stream-op plan for versions (lo, hi]: a list of
    (version, op, [(relative path, bytes), ...]) for every commit
    that EMITS files, under the op contract both stream readers
    share (the Delta readStream contract, rebuilt):

    - append / stream-append: emitted (exact row-level increments).
    - optimize: SKIPPED — a re-layout changes no data; its add
      actions are this format's dataChange=false.
    - merge / overwrite / restore / delete / update: RAISE
      NonAppendChange by default (a merge's or update's files carry
      updates + survivors, a delete's carry survivors only, an
      overwrite is a snapshot replace, a restore RE-ADDS historical
      files whose rows already streamed — all would double-count
      for an append-stream consumer; the restore leg is ADVICE r11:
      it previously slipped through as a silent re-emit). Opt in
      with ignore_changes=true to receive their files under
      read_changes()'s apply-by-key contract.
    - set-/drop-constraint (and any other fileless op): no add
      actions, nothing to emit, never an error.

    Each add rides through as (relative path, bytes, partition
    token dict or None) — partition values live in directory names,
    so a partitioned table's reader must re-materialize them
    (r11)."""
    out = []
    for v in _list_versions(root):
        if v <= lo or v > hi:
            continue
        e = json.load(open(_version_file(root, v)))
        if e["op"] in ("optimize", "bloom-backfill"):
            continue  # dataChange=false: same rows, new layout/refs
        if (e["op"] in ("merge", "overwrite", "restore",
                        "delete", "update", "replace")
                and not ignore_changes):
            raise NonAppendChange(
                f"version {v} is a {e['op']} commit; set "
                f"ignore_changes=true to stream its files "
                f"under the apply-by-key contract")
        # deletion-vector adds are ORIGINAL bytes re-committed with
        # a vector ref — emitting them raw would resurrect deleted
        # rows. A dv-mode DML commit's vector-carrying adds carry
        # NO new rows (delete: nothing new; update/merge-delete:
        # the new rows ride the commit's OTHER, vector-free adds),
        # so under ignore_changes they are SKIPPED (Delta's
        # ignoreDeletes shape) while the vector-free adds emit. Any
        # other op whose adds carry a vector (streaming a clone of
        # a dv-bearing table, a restore across one) refuses
        # outright — read()/read_changes() are the vector-applying
        # paths.
        dv_adds = [a for a in e["actions"]
                   if "add" in a and "dv" in a["add"]]
        if dv_adds and e["op"] not in ("delete", "update", "merge"):
            raise NonAppendChange(
                f"version {v} ({e['op']}) adds files carrying "
                f"deletion vectors; the stream cannot emit raw "
                f"bytes without resurrecting deleted rows — read "
                f"via read()/read_changes() instead")
        adds = [(a["add"]["path"], a["add"].get("bytes", 0),
                 a["add"].get("partition"))
                for a in e["actions"]
                if "add" in a and "dv" not in a["add"]]
        if adds:
            out.append((v, e["op"], adds))
    return out


def _plan_cdf_window(root: str, lo: int, hi: int) -> list[tuple]:
    """The ROW-LEVEL CDF stream plan for versions (lo, hi] — the
    read_changes_rows() classification re-expressed as per-file
    EXECUTOR TASKS, planned from log metadata only (the driver never
    opens a data or vector file). Each task is

        (rel path, partition tokens | None, bytes, version, op,
         change_type, keep, new-dv dir | None, prev-dv dir | None)

    where ``keep`` tells the executor which rows of the file to
    emit: "all" (every row), "live" (all minus the prev-dv
    positions — a dropped file's rows live as of v-1, or a cloned
    dv-file's live rows), "diff" (new-dv minus prev-dv positions —
    exactly THIS commit's deleted/updated rows; each vector is
    cumulative per file, so the difference is the increment).

    Refusals are read_changes_rows' own: rewrite-mode DML,
    overwrite, restore and replace commits raise NonAppendChange —
    a rewrite mixes changed and carried rows indistinguishably, so
    row-level typing would be a guess; run DML in mode="dv" (or
    consume the file-level txlogstream with ignore_changes)."""
    tasks: list[tuple] = []
    for v in _list_versions(root):
        if v <= lo or v > hi:
            continue
        e = json.load(open(_version_file(root, v)))
        op = e["op"]
        if op in ("optimize", "bloom-backfill"):
            continue  # dataChange=false
        adds = [a["add"] for a in e["actions"] if "add" in a]
        removes = [a["remove"]["path"] for a in e["actions"]
                   if "remove" in a]
        if op in ("append", "stream-append", "clone"):
            for a in adds:
                dv = a.get("dv")
                # a CLONE of a dv-bearing table: inserts are the
                # LIVE rows (raw bytes would resurrect deletes)
                tasks.append((a["path"], a.get("partition"),
                              a.get("bytes", 0), v, op, "insert",
                              "live" if dv else "all", None,
                              dv["path"] if dv else None))
            continue
        if e.get("mode") != "dv":
            if not adds and not removes:
                continue  # fileless (constraints, renames, txn...)
            raise NonAppendChange(
                f"version {v} is a {op} commit without deletion "
                f"vectors; row-level change typing is only exact "
                f"for dv-mode DML — run DML in mode='dv' or use "
                f"the file-level txlogstream source")
        prev = snapshot(root, v - 1)
        pre_ct = "update_preimage" if op == "update" else "delete"
        dv_adds = {a["path"]: a for a in adds if "dv" in a}
        for p in sorted(dv_adds):
            a = dv_adds[p]
            pr = (prev["files"].get(p) or {}).get("dv")
            tasks.append((p, a.get("partition"), a.get("bytes", 0),
                          v, op, pre_ct, "diff", a["dv"]["path"],
                          pr["path"] if pr else None))
        for p in sorted(x for x in removes if x not in dv_adds):
            m = prev["files"].get(p) or {}
            pr = m.get("dv")
            tasks.append((p, m.get("partition"), m.get("bytes", 0),
                          v, op, pre_ct, "live", None,
                          pr["path"] if pr else None))
        for a in adds:
            if "dv" not in a:
                tasks.append((a["path"], a.get("partition"),
                              a.get("bytes", 0), v, op,
                              "update_postimage", "all", None, None))
    return tasks


def _arrow_project(tbl, target, cmap: dict, part: dict | None):
    """EXECUTOR-side projection of a raw parquet table to the exact
    arrow schema Spark expects: physical->logical rename via the
    open-time colmap, hive partition tokens injected as constant
    columns (cast from string exactly like Spark's partition
    discovery), NULL backfill for fields a pre-evolution file lacks.
    Shared by the parallel stream reader and the CDF stream reader."""
    import pyarrow as pa

    cols = []
    for field in target:
        pname = cmap.get(field.name, field.name)
        if pname in tbl.column_names:
            cols.append(tbl.column(pname).cast(field.type))
        elif part and part.get(pname) is not None:
            tok_arr = pa.array([part[pname]] * len(tbl),
                               type=pa.string())
            if (pa.types.is_timestamp(field.type)
                    and field.type.tz is not None):
                # r14: recorded timestamp tokens are UTC-normalized
                # (_utc_token); arrow refuses a zone-less string ->
                # zoned-timestamp cast, so parse naive then pin UTC.
                # Legacy space-form tokens parse the same way (the
                # engine's sessions run UTC; pre-r14 the native
                # read of a timestamp-partitioned table CRASHED
                # here, so there is no other behavior to keep)
                import pyarrow.compute as pc
                naive = tok_arr.cast(
                    pa.timestamp(field.type.unit))
                cols.append(pa.chunked_array([
                    pc.assume_timezone(naive, "UTC")
                    .cast(field.type)]))
            else:
                cols.append(pa.chunked_array(
                    [tok_arr.cast(field.type)]))
        else:
            cols.append(pa.chunked_array(
                [pa.nulls(len(tbl), field.type)]))
    return pa.table(cols, schema=target)


def _dv_positions(dv_dir: str | None, basename: str) -> set:
    """EXECUTOR-side read of one file's deleted positions from a dv
    sidecar dir (parquet dataset of (file, pos) rows; the 'file ==
    basename' filter pushes into the scan). None dir = no vector."""
    if not dv_dir:
        return set()
    import pyarrow.parquet as pq

    t = pq.read_table(dv_dir, columns=["pos"],
                      filters=[("file", "==", basename)])
    return set(t.column("pos").to_pylist())


def _stream_fields(root: str, snap: dict | None = None):
    """(field names, tz-aware timestamp field names) for the stream
    row shape — from the RECORDED log schema when one exists (every
    table written since schema tracking; valid even while the live
    file set is empty, which is exactly the bronze-bootstrap case —
    VERDICT r10 What's-wrong #2), else from one live file's footer.
    Pass ``snap`` to pin an already-resolved snapshot instead of
    re-reading the log."""
    if snap is None:
        snap = snapshot(root)
    if snap.get("schema"):
        from pyspark.sql.types import StructType as _ST
        st = _ST.fromJson(json.loads(snap["schema"]))
        return ([f.name for f in st.fields],
                {f.name for f in st.fields
                 if f.dataType.typeName() == "timestamp"})
    if not snap["files"]:
        raise ValueError(
            "txlogstream: empty table with no recorded schema "
            f"under {root}; commit data first")
    import pyarrow.parquet as pq
    first = sorted(snap["files"])[0]
    sch = pq.ParquetFile(os.path.join(root, first)).schema_arrow
    return ([f.name for f in sch],
            {f.name for f in sch
             if str(f.type).startswith("timestamp")
             and "tz=" in str(f.type)})


try:  # pyspark.sql.datasource needs an active PySpark >= 4 install
    from pyspark.sql.datasource import (DataSource,
                                        DataSourceArrowWriter,
                                        DataSourceReader,
                                        DataSourceStreamArrowWriter,
                                        DataSourceStreamReader,
                                        InputPartition,
                                        SimpleDataSourceStreamReader,
                                        WriterCommitMessage)

    class TxLogFilePartition(InputPartition):
        """One executor task of a txlogstream micro-batch: a group
        of the window's add files (packed to ~partition_bytes),
        each with its hive-partition token dict (None on an
        unpartitioned table), plus the Spark schema JSON they
        project through. Picklable by construction (strings and
        dicts of strings only)."""

        def __init__(self, files: list[tuple], schema_json: str,
                     colmap: dict | None = None):
            self.files = files  # [(abs path, {col: token} | None)]
            self.schema_json = schema_json
            # logical -> physical column names, bound when the
            # reader opened: physical names never change, so the
            # binding stays valid across later renames (the stream
            # keeps its open-time logical schema, as Spark streams
            # must)
            self.colmap = colmap or {}

    class TxLogParallelStreamReader(DataSourceStreamReader):
        """readStream FROM the transaction-log table on the FULL
        DataSourceStreamReader API — the source twin of
        stream_sink() (together they chain table-to-table streaming
        pipelines with exactly-once on both edges), and the r11
        replacement for the Simple-API reader that materialized
        every micro-batch's rows on the driver (VERDICT r10
        What's-wrong #1, the round's one `weak`).

        Offsets ARE log versions: batch (start_v, head_v] emits the
        add files of the window's commits, so the stream's progress
        is exactly the table's commit history. The driver plans
        ONLY METADATA — partitions() maps the window's add actions
        (path + size, already in the log) to file groups packed to
        ~partition_bytes; read(partition) runs ON THE EXECUTORS,
        opening each parquet with pyarrow and yielding Arrow
        RecordBatches projected through the recorded schema (the
        same NULL-backfill read() applies — a file predating an
        evolved column surfaces NULL for it). A gigabytes-per-batch
        bronze window therefore streams through as many parallel
        tasks as it has file groups; no row ever transits the
        driver.

        Restart safety: Spark checkpoints the planned offsets and
        re-hands them to partitions() on recovery; commits are
        immutable, so a replanned window is byte-identical.

        ADMISSION CONTROL (max_versions_per_trigger, r11): each
        planned batch advances at most that many versions, so
        recovery after N unseen commits replays in ceil(N/cap)
        bounded micro-batches instead of one unbounded one (the
        maxFilesPerTrigger analog). latestOffset() caps relative to
        a BASE = the last end this reader instance has planned
        (partitions()/initialOffset set it), falling back — the
        Python stream API hands latestOffset() no committed-offset
        input, and Spark calls it BEFORE initialOffset on a fresh
        query — to a PERSISTED CURSOR: pass .option("reader_id",
        <name>) and commit(end) records the completed offset under
        _txlog/_reader-<name>.json (the Kafka consumer-group
        pattern), so both the fresh catch-up and the
        post-restart recovery are exactly capped. Without a
        reader_id the first batch of each run is uncapped and every
        subsequent one capped (documented fallback). The cursor
        only ever bounds the batch END from above the true base —
        a stale/ahead cursor degrades bounding, never correctness;
        use one reader_id per query checkpoint.

        BYTES admission control (max_bytes_per_trigger, r15 —
        VERDICT r14 #6, the maxBytesPerTrigger analog): each batch
        admits whole add files until the next would cross the byte
        cap; offsets gain a file cursor ("f" = adds of the
        partially-consumed version already emitted), so one giant
        backfill commit drains in ceil(bytes/cap) bounded batches.
        partitions() derives purely from (start, end) over the
        immutable log, so a checkpointed partial window replans
        byte-identically on restart. Composes with the version cap
        (versions bound first, bytes slice within).

        Op semantics are _plan_window()'s contract (shared with the
        Simple fallback reader): append/stream-append emitted,
        optimize skipped, merge/overwrite/restore raise
        NonAppendChange unless ignore_changes=true."""

        _DEFAULT_PACK = 128 * 1024 * 1024

        def __init__(self, options, schema,
                     snap: dict | None = None):
            self.root = options["path"]
            self.start_v = int(options.get("starting_version", 0))
            self.ignore_changes = (
                str(options.get("ignore_changes", "false")).lower()
                == "true")
            self.cap = int(options.get("max_versions_per_trigger", 0))
            # BYTES admission control (VERDICT r14 #6, Delta's
            # maxBytesPerTrigger): each planned batch admits whole
            # files until the next would cross this many add-action
            # bytes — offsets gain a FILE CURSOR ("f": adds of the
            # partially-consumed version already emitted), so one
            # giant backfill commit drains in bounded batches
            # instead of one unbounded one. A single file larger
            # than the cap still streams, alone (progress
            # guarantee). 0 = off.
            self.max_bytes = int(options.get(
                "max_bytes_per_trigger", 0))
            self.pack_bytes = int(options.get(
                "partition_bytes", self._DEFAULT_PACK))
            self.reader_id = options.get("reader_id")
            self._schema_json = schema.json()
            self._last_end: "tuple[int, int] | None" = None
            # one snapshot pins validation AND colmap together —
            # callers that already resolved one (the CDF batch path)
            # pass it so a commit landing mid-resolution can't make
            # schema, colmap epoch and version window disagree
            if snap is None:
                snap = snapshot(self.root)
            _stream_fields(self.root, snap)  # schema resolvable?
            # column mapping bound at open time (see
            # TxLogFilePartition.colmap)
            self._colmap = snap.get("colmap") or {}

        def _cursor_path(self) -> str:
            return os.path.join(_log_path(self.root),
                                f"_reader-{self.reader_id}.json")

        def initialOffset(self):
            self._last_end = (self.start_v, 0)
            return {"v": self.start_v}

        def _version_items(self, v: int) -> list[int]:
            """Per-item byte sizes of version ``v``'s stream plan,
            in the EXACT order partitions() emits them — the file
            cursor's index domain (the CDF subclass overrides with
            its task plan). Deterministic over the immutable log,
            so a replayed (start, end) window slices identically."""
            win = _plan_window(self.root, v - 1, v,
                               self.ignore_changes)
            return [nb for _v, _op, adds in win
                    for _rel, nb, _pt in adds]

        def _bytes_capped_end(self, bv: int, bf: int,
                              head: int) -> dict:
            """The earliest offset whose window (from cursor
            (bv, bf)) stays under max_bytes_per_trigger: admit
            whole files version by version until the NEXT file
            would cross the budget — at least one file always
            admits (a single file larger than the cap streams
            alone), and the walk stops at the budget, so a merge
            commit beyond the admitted window is never planned."""
            total = 0
            emitted = False
            v = bv if bf else bv + 1
            while v <= head:
                items = self._version_items(v)
                for i in range(bf if v == bv else 0, len(items)):
                    if emitted and total + items[i] > self.max_bytes:
                        # i == 0: NOTHING of v admits — the end is
                        # the complete-version form {"v": v-1}, NOT
                        # {"v": v, "f": 0}: partitions() reads a
                        # falsy "f" as "version fully included", so
                        # the f=0 spelling would ship ALL of v (a
                        # giant backfill commit uncapped) whenever
                        # the budget filled exactly at a version
                        # boundary. (v > bv here: at v == bv the
                        # loop starts at i = bf > 0 with emitted
                        # still False, so it admits first.)
                        return {"v": v, "f": i} if i else \
                            {"v": v - 1}
                    total += items[i]
                    emitted = True
                v += 1
            return {"v": head}

        def latestOffset(self):
            versions = _list_versions(self.root)
            head = versions[-1] if versions else self.start_v
            base = self._last_end
            if base is None and self.reader_id is not None:
                try:  # persisted cursor: last offset commit()ed by
                    # any run of this reader_id; on the first run
                    # (no cursor yet) the base is starting_version —
                    # which is why reader_id must be set from the
                    # query's FIRST run, not adopted mid-history
                    d = json.load(open(self._cursor_path()))
                    bv, bf = d["v"], d.get("f", 0)
                    if bv < self.start_v:
                        bv, bf = self.start_v, 0
                    base = (bv, bf)
                except (OSError, ValueError, KeyError):
                    base = (self.start_v, 0)
            if base is not None:
                bv, bf = base
                if self.cap:
                    head = min(head, bv + self.cap)
                head = max(head, bv)  # offsets monotone
                if self.max_bytes and (head > bv or bf):
                    return self._bytes_capped_end(bv, bf, head)
            return {"v": head}

        def partitions(self, start, end):
            sv, sf = start["v"], start.get("f", 0)
            ev, ef = end["v"], end.get("f", 0)
            self._last_end = (ev, ef)
            # sf > 0: version sv is partially consumed — its
            # remaining adds (index >= sf) open this window; ef > 0:
            # version ev closes it partially (index < ef). Both
            # cursors index _version_items' deterministic order.
            window = _plan_window(self.root,
                                  (sv - 1) if sf else sv, ev,
                                  self.ignore_changes)
            parts: list[TxLogFilePartition] = []
            cur: list[tuple] = []
            cur_b = 0
            for _v, _op, adds in window:
                for i, (rel, nbytes, part) in enumerate(adds):
                    if _v == sv and sf and i < sf:
                        continue
                    if _v == ev and ef and i >= ef:
                        continue
                    if cur and cur_b + nbytes > self.pack_bytes:
                        parts.append(TxLogFilePartition(
                            cur, self._schema_json, self._colmap))
                        cur, cur_b = [], 0
                    cur.append((os.path.join(self.root, rel), part))
                    cur_b += nbytes
            if cur:
                parts.append(TxLogFilePartition(
                    cur, self._schema_json, self._colmap))
            return parts

        def read(self, partition):
            # EXECUTOR-side: open the partition's parquet files with
            # pyarrow and yield RecordBatches cast to the exact arrow
            # schema Spark expects for the declared row type (the
            # same to_arrow_schema the tuple path uses), with NULL
            # columns materialized for fields a pre-evolution file
            # lacks. Zero driver involvement per row.
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            target = to_arrow_schema(
                _ST.fromJson(json.loads(partition.schema_json)))
            for path, part in partition.files:
                # hive partition columns inject from directory
                # tokens; colmap renames physical->logical; missing
                # (pre-evolution) fields NULL-backfill — all in
                # _arrow_project, shared with the CDF reader
                out = _arrow_project(pq.read_table(path), target,
                                     partition.colmap, part)
                for batch in out.to_batches():
                    yield batch

        def commit(self, end):
            if self.reader_id is None:
                return
            # persist the completed offset for this reader_id so a
            # restarted run's latestOffset() can bound its first
            # batch (atomic same-FS replace; the tmp-*.part name is
            # the one vacuum() already reclaims if a crash strands
            # it)
            tmp = os.path.join(_log_path(self.root),
                               f"tmp-{uuid.uuid4().hex}.part")
            with open(tmp, "w") as fh:
                json.dump({"v": end["v"],
                           "f": end.get("f", 0)}, fh)
            os.replace(tmp, self._cursor_path())

    class TxLogStreamReader(SimpleDataSourceStreamReader):
        """The SIMPLE-API fallback reader (driver-side rows — the
        documented tradeoff of SimpleDataSourceStreamReader, same
        as the avrolite tail and BarReplay sources). The DEFAULT
        path is TxLogParallelStreamReader above; this one stays for
        .option("use_simple_reader", "true"), for environments
        without the full-API wire, and as the parity twin the tests
        compare the parallel reader against. Offsets, op contract
        (via the shared _plan_window) and admission control match
        the parallel reader batch-for-batch; read(start) receives
        the committed start offset directly, so the cap here is
        exact across restarts. max_bytes_per_trigger is a
        parallel-reader feature: this reader plans whole versions
        only, so do NOT switch a checkpointed bytes-capped query
        to use_simple_reader mid-history — a partial ("f"-cursor)
        offset would resume at the version boundary."""

        def __init__(self, options):
            self.root = options["path"]
            self.start_v = int(options.get("starting_version", 0))
            self.ignore_changes = (
                str(options.get("ignore_changes", "false")).lower()
                == "true")
            self.cap = int(options.get("max_versions_per_trigger", 0))
            snap0 = snapshot(self.root)
            if snap0.get("partition_by"):
                raise ValueError(
                    "txlogstream: the simple (driver-side) reader "
                    "does not materialize hive partition columns; "
                    "use the default parallel reader for a "
                    "partitioned table")
            if snap0.get("colmap"):
                raise ValueError(
                    "txlogstream: the simple (driver-side) reader "
                    "does not translate column-mapped (renamed) "
                    "physical names; use the default parallel "
                    "reader")
            self._fields, self._tz_fields = _stream_fields(self.root)

        def _rows(self, lo: int, hi: int):
            import pyarrow.parquet as pq

            out = []
            for _v, _op, adds in _plan_window(
                    self.root, lo, hi, self.ignore_changes):
                for rel, _nbytes, _part in adds:
                    tbl = pq.read_table(os.path.join(self.root, rel))
                    for rec in tbl.to_pylist():
                        # rec.get: a file predating an evolved
                        # column yields None for it (the same
                        # NULL-backfill projection read() applies).
                        # TIMESTAMP (LTZ) fields: parquet stores
                        # UTC-normalized micros; arrow may hand
                        # back tz-naive datetimes, which the row
                        # converter refuses — pin UTC explicitly.
                        out.append(tuple(
                            v.replace(tzinfo=_utc)
                            if (f in self._tz_fields
                                and v is not None
                                and v.tzinfo is None) else v
                            for f in self._fields
                            for v in (rec.get(f),)))
            return out

        def initialOffset(self):
            return {"v": self.start_v}

        def read(self, start):
            versions = _list_versions(self.root)
            head = versions[-1] if versions else start["v"]
            if self.cap:
                head = min(head, start["v"] + self.cap)
            head = max(head, start["v"])
            return iter(self._rows(start["v"], head)), {"v": head}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["v"], end["v"]))

        def commit(self, end):
            pass

    class TxLogStreamDataSource(DataSource):
        """spark.readStream.format("txlogstream").option("path", root)
        — register with spark.dataSource.register(TxLogStreamDataSource).

        Options: path (required), starting_version,
        ignore_changes, max_versions_per_trigger,
        partition_bytes (full reader's file-group pack target),
        use_simple_reader (force the driver-side fallback)."""

        @classmethod
        def name(cls) -> str:
            return "txlogstream"

        def schema(self) -> str:
            snap = snapshot(self.options["path"])
            if snap.get("schema"):
                # the recorded schema serves even when the live
                # file set is EMPTY — a stream can open on a
                # just-created bronze table and wait for data
                # (VERDICT r10 What's-wrong #2)
                from pyspark.sql.types import StructType as _ST
                st = _ST.fromJson(json.loads(snap["schema"]))
                return ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in st.fields)
            if not snap["files"]:
                raise ValueError(
                    "txlogstream: cannot infer schema from an "
                    "empty table with no recorded schema; commit "
                    "data first")
            first = sorted(snap["files"])[0]
            return _pa_to_ddl(
                os.path.join(self.options["path"], first))

        def streamReader(self, schema) -> TxLogParallelStreamReader:
            if str(self.options.get("use_simple_reader",
                                    "false")).lower() == "true":
                from pyspark.errors import PySparkNotImplementedError
                raise PySparkNotImplementedError(  # -> simple fallback
                    errorClass="NOT_IMPLEMENTED",
                    messageParameters={"feature": "streamReader"})
            return TxLogParallelStreamReader(self.options, schema)

        def simpleStreamReader(self, schema) -> TxLogStreamReader:
            return TxLogStreamReader(self.options)

    _CDF_META = ("_commit_version", "_commit_op", "_change_type")

    class TxLogCdfPartition(InputPartition):
        """One executor task group of a txlogcdf micro-batch: CDF
        file tasks (see _plan_cdf_window; paths made absolute at
        plan time) packed to ~partition_bytes, plus the full stream
        schema JSON (table schema + the three CDF meta columns) and
        the open-time colmap. Picklable by construction."""

        def __init__(self, tasks: list[tuple], schema_json: str,
                     colmap: dict | None = None):
            self.tasks = tasks
            self.schema_json = schema_json
            self.colmap = colmap or {}

    class TxLogCdfStreamReader(TxLogParallelStreamReader):
        """STREAMING ROW-LEVEL CDF source (VERDICT r11 #2) —
        read_changes_rows() as a readStream format, the capstone of
        the deletion-vector work: offsets are log versions (the D27
        contract, inherited — admission control, the reader_id
        cursor and restart-safe replanning all carry), and each
        micro-batch emits the window's typed `_change_type` rows:

        - append / stream-append / clone commits -> "insert" rows
          (a dv-carrying clone emits LIVE rows only);
        - dv-mode DELETE / MERGE-DELETE -> exactly the commit's
          deleted rows, "delete";
        - dv-mode UPDATE -> "update_preimage" (the newly vectored
          positions) + "update_postimage" (the commit's fresh
          files);
        - optimize / fileless commits -> nothing;
        - rewrite-mode DML / overwrite / restore / replace -> RAISE
          (read_changes_rows' refusal, carried).

        The vector DIFFS run ON THE EXECUTORS: partitions() plans
        only log metadata (each task names its data file and the
        new/prev dv sidecar dirs), read(partition) loads the two
        position sets with a pushed-down `file == basename` scan,
        takes the difference, and slices the parquet table — no row
        or position transits the driver. Composing with
        foreachBatch(replicate_stream(...)) turns this source into
        a CONTINUOUS replica (pytest pins it equal to
        replicate_incremental's result table)."""

        def _version_items(self, v: int) -> list[int]:
            # the CDF task plan's per-task bytes, the index domain
            # the bytes-capped file cursor slices (dv-diff tasks
            # count their data file's bytes — conservative)
            return [t[2] for t in
                    _plan_cdf_window(self.root, v - 1, v)]

        def partitions(self, start, end):
            sv, sf = start["v"], start.get("f", 0)
            ev, ef = end["v"], end.get("f", 0)
            self._last_end = (ev, ef)
            plan = _plan_cdf_window(self.root,
                                    (sv - 1) if sf else sv, ev)
            parts: list[TxLogCdfPartition] = []
            cur: list[tuple] = []
            cur_b = 0
            vidx: dict[int, int] = {}
            for (rel, ptok, nbytes, v, op, ct, keep,
                 new_dv, prev_dv) in plan:
                i = vidx.get(v, 0)
                vidx[v] = i + 1
                if v == sv and sf and i < sf:
                    continue
                if v == ev and ef and i >= ef:
                    continue
                if cur and cur_b + nbytes > self.pack_bytes:
                    parts.append(TxLogCdfPartition(
                        cur, self._schema_json, self._colmap))
                    cur, cur_b = [], 0
                cur.append((
                    os.path.join(self.root, rel), ptok, v, op, ct,
                    keep,
                    os.path.join(self.root, new_dv)
                    if new_dv else None,
                    os.path.join(self.root, prev_dv)
                    if prev_dv else None))
                cur_b += nbytes
            if cur:
                parts.append(TxLogCdfPartition(
                    cur, self._schema_json, self._colmap))
            return parts

        def read(self, partition):
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            full = _ST.fromJson(json.loads(partition.schema_json))
            data_st = _ST([f for f in full.fields
                           if f.name not in _CDF_META])
            target = to_arrow_schema(data_st)
            target_full = to_arrow_schema(full)
            meta_type = {f.name: f.type for f in target_full
                         if f.name in _CDF_META}
            for (path, ptok, v, op, ct, keep,
                 new_dv, prev_dv) in partition.tasks:
                tbl = pq.read_table(path)
                base = os.path.basename(path)
                if keep == "live":
                    drop = _dv_positions(prev_dv, base)
                    if drop:
                        mask = np.ones(len(tbl), dtype=bool)
                        mask[sorted(drop)] = False
                        tbl = tbl.filter(pa.array(mask))
                elif keep == "diff":
                    take = sorted(_dv_positions(new_dv, base)
                                  - _dv_positions(prev_dv, base))
                    tbl = tbl.take(pa.array(take, type=pa.int64()))
                if len(tbl) == 0:
                    continue
                out = _arrow_project(tbl, target, partition.colmap,
                                     ptok)
                n = len(out)
                consts = {"_commit_version": v, "_commit_op": op,
                          "_change_type": ct}
                # data fields lead the declared schema, the three
                # meta columns close it — appending constants in
                # _CDF_META order lands the target_full layout
                cols = list(out.columns)
                for mname in _CDF_META:
                    cols.append(pa.chunked_array([pa.array(
                        [consts[mname]] * n,
                        type=meta_type[mname])]))
                final = pa.table(cols, schema=target_full)
                for batch in final.to_batches():
                    yield batch

    class TxLogCdfStreamDataSource(DataSource):
        """spark.readStream.format("txlogcdf").option("path", root)
        — register with spark.dataSource.register(
        TxLogCdfStreamDataSource). Options: path (required),
        starting_version, max_versions_per_trigger, reader_id,
        partition_bytes. Schema = the table's recorded schema plus
        the Delta-CDF meta columns (_commit_version int, _commit_op
        string, _change_type string)."""

        @classmethod
        def name(cls) -> str:
            return "txlogcdf"

        def _pinned_snap(self) -> dict:
            # ONE snapshot per source resolution: schema(), the
            # wrapped stream reader's colmap and the batch reader's
            # default to_version all read the SAME log state, so a
            # commit (e.g. a rename) landing between them cannot
            # make the projected schema, colmap epoch and version
            # window disagree within one read (ADVICE r12)
            snap = getattr(self, "_snap_cache", None)
            if snap is None:
                snap = self._snap_cache = snapshot(
                    self.options["path"])
            return snap

        def schema(self) -> str:
            snap = self._pinned_snap()
            if not snap.get("schema"):
                raise ValueError(
                    "txlogcdf: the row-level change stream needs a "
                    "recorded table schema; commit data first")
            from pyspark.sql.types import StructType as _ST
            st = _ST.fromJson(json.loads(snap["schema"]))
            return (", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in st.fields)
                + ", _commit_version int, _commit_op string, "
                  "_change_type string")

        def streamReader(self, schema) -> TxLogCdfStreamReader:
            return TxLogCdfStreamReader(self.options, schema,
                                        self._pinned_snap())

        def reader(self, schema) -> "TxLogCdfBatchReader":
            return TxLogCdfBatchReader(self.options, schema,
                                       self._pinned_snap())

    class TxLogCdfBatchReader(DataSourceReader):
        """BATCH row-level CDF through the same format —
        ``spark.read.format("txlogcdf").option("path", root)
        .option("from_version", N).option("to_version", M)`` — the
        Delta ``readChangeFeed`` batch analog: one fixed
        (from_version, to_version] window of typed _change_type
        rows, planned and diffed EXACTLY like the stream (the
        reader wraps TxLogCdfStreamReader and hands it the window
        as a single pseudo-epoch, so executor-side vector diffs,
        colmap epochs, and the rewrite-mode refusal are all one
        code path with read_changes_rows()). from_version is
        EXCLUSIVE (the function API's convention), default 0;
        to_version inclusive, default the current head — pinned at
        plan time for snapshot isolation."""

        def __init__(self, options, schema,
                     snap: dict | None = None):
            if snap is None:
                snap = snapshot(options["path"])
            self._stream = TxLogCdfStreamReader(options, schema,
                                                snap)
            self.from_v = int(options.get("from_version", 0))
            to = options.get("to_version")
            self.to_v = (int(to) if to is not None
                         else snap["version"])

        def partitions(self):
            parts = self._stream.partitions(
                {"v": self.from_v}, {"v": self.to_v})
            return parts or [TxLogCdfPartition(
                [], self._stream._schema_json,
                self._stream._colmap)]

        def read(self, partition):
            return TxLogCdfStreamReader.read(self._stream,
                                             partition)

    class TxLogBatchPartition(InputPartition):
        """One executor task of a batch ``format("txlog")`` scan: a
        group of live data files (packed to ~partition_bytes), each
        with its hive-partition token dict and its deletion-vector
        sidecar dir (both None when absent), plus the Spark schema
        JSON to project through and the snapshot's colmap.
        Picklable by construction (strings/dicts/None only)."""

        def __init__(self, files: list[tuple], schema_json: str,
                     colmap: dict | None = None):
            self.files = files  # [(abs path, {col: tok}|None, dv|None)]
            self.schema_json = schema_json
            self.colmap = colmap or {}

    # Pushed In-lists above this width skip file pruning (each value
    # is a full metadata pass; a 1000-value IN belongs to the
    # residual filter, not the planner).
    _IN_PUSHDOWN_BOUND = 32

    class TxLogPlainBatchReader(DataSourceReader):
        """BATCH read of the transaction-log table as a native
        Spark source — the unpruned base: plan every live file,
        read executor-side through the shared projection. The
        default reader is the TxLogBatchReader subclass, which adds
        Catalyst filter pushdown; this base exists because Spark
        REFUSES a pushFilters-implementing reader when
        ``spark.sql.python.filterPushdown.enabled`` is false —
        ``.option("pushdown", "false")`` selects this class so
        sessions that cannot enable the conf still scan correctly
        (just without file skipping).

        The snapshot is PINNED when the source resolves (commits
        after plan time are invisible — the same isolation
        ``read()`` gives), and the per-row work runs on the
        EXECUTORS: read(partition) opens each parquet with pyarrow,
        masks the file's deleted positions from its dv sidecar
        (file == basename pushed into the sidecar scan), and
        projects through the shared _arrow_project (colmap +
        partition tokens + NULL backfill). No row or position
        transits the driver."""

        _DEFAULT_PACK = 128 * 1024 * 1024

        def __init__(self, options, schema, snap: dict, root: str):
            self.root = root
            self.pack_bytes = int(options.get(
                "partition_bytes", self._DEFAULT_PACK))
            self._schema_json = schema.json()
            self._snap = snap
            self._colmap = snap.get("colmap") or {}
            self._conjuncts: list[tuple] = []
            self._in_lists: list[tuple] = []

        def __getstate__(self):
            # the reader ships to executors alongside read(); the
            # snapshot dict is plan-time state a million-file table
            # should not pay to broadcast — partitions carry
            # everything read() needs
            st = dict(self.__dict__)
            st["_snap"] = None
            return st

        def _kept_paths(self) -> list[str]:
            snap = self._snap
            if not snap["files"]:
                return []
            # IN-lists join the conjunct pass as ("in", values)
            # tuples (r13): ONE metadata pass for the whole
            # predicate instead of one full pass per in-list value
            conj = self._conjuncts + [
                (col, "in", tuple(vals))
                for col, vals in self._in_lists]
            if not conj:
                return sorted(snap["files"])
            return sorted(_files_possibly_matching(
                snap, conj, self.root, None))

        def partitions(self):
            snap = self._snap
            files = snap["files"]
            parts: list[TxLogBatchPartition] = []
            cur: list[tuple] = []
            cur_b = 0
            for p in self._kept_paths():
                m = files[p] or {}
                nbytes = m.get("bytes", 0)
                if cur and cur_b + nbytes > self.pack_bytes:
                    parts.append(TxLogBatchPartition(
                        cur, self._schema_json, self._colmap))
                    cur, cur_b = [], 0
                dv = m.get("dv")
                cur.append((
                    os.path.join(self.root, p), m.get("partition"),
                    os.path.join(self.root, dv["path"])
                    if dv else None))
                cur_b += nbytes
            if cur:
                parts.append(TxLogBatchPartition(
                    cur, self._schema_json, self._colmap))
            # fully-pruned (or empty-table) scans still need one
            # no-op task: Spark's Python batch scan requires a
            # non-empty partition list
            return parts or [TxLogBatchPartition(
                [], self._schema_json, self._colmap)]

        def read(self, partition):
            # EXECUTOR-side, the stream reader's read path plus the
            # per-file deletion-vector mask (CDF "live" mode).
            # Column PRUNING happens here: only the physical columns
            # the target schema projects are read from each file
            # (matters when the caller supplied a narrower .schema()
            # — the Python DS API has no pruneColumns hook, so a
            # bare .select() still ships every declared column, but
            # an explicit schema pays only for what it names). The
            # dv mask keys PHYSICAL row positions, which a column
            # subset preserves.
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            target = to_arrow_schema(
                _ST.fromJson(json.loads(partition.schema_json)))
            wanted = {partition.colmap.get(f.name, f.name)
                      for f in target}
            for path, part, dv_dir in partition.files:
                pf = pq.ParquetFile(path)
                cols = [n for n in pf.schema_arrow.names
                        if n in wanted]
                if not cols and pf.schema_arrow.names:
                    # projection covers none of the file's columns
                    # (e.g. partition columns only): read ONE for
                    # the row count the token/NULL backfill needs
                    cols = [pf.schema_arrow.names[0]]
                tbl = pf.read(columns=cols)
                drop = _dv_positions(dv_dir, os.path.basename(path))
                if drop:
                    mask = np.ones(len(tbl), dtype=bool)
                    mask[sorted(drop)] = False
                    tbl = tbl.filter(pa.array(mask))
                out = _arrow_project(tbl, target, partition.colmap,
                                     part)
                for batch in out.to_batches():
                    yield batch

    class TxLogBatchReader(TxLogPlainBatchReader):
        """The DEFAULT batch reader: TxLogPlainBatchReader plus
        CATALYST FILTER PUSHDOWN driving the same file skipping
        ``read_where()`` does by hand.

        With ``spark.sql.python.filterPushdown.enabled=true``
        (session.py sets it), Spark hands ``.where(...)``'s
        conjuncts to pushFilters() at plan time; recognized shapes
        (EqualTo / EqualNullSafe / range ops / In / IsNull /
        IsNotNull / StringStartsWith on a top-level column with an
        int/float/str literal) become the conjunct tuples the
        engine's pruning core consumes, and partitions() plans ONLY
        the files _files_possibly_matching keeps — partition-value
        pruning, footer zone maps, and bloom sidecar probes, all
        from log metadata, no data IO. EVERY filter is returned to
        Spark for re-application (the Delta data-skipping contract:
        pushdown here is an IO optimization, never a correctness
        dependency).

        StringStartsWith pushes as the implied range
        [prefix, next-prefix): ``col LIKE 'ab%'`` prunes like
        ``col >= 'ab' AND col < 'ac'`` — sound because Python str
        compare and Spark's UTF8 binary compare agree on code-point
        order. In-lists prune as the UNION of their values'
        survivor sets (a file survives if ANY value might hit),
        capped at _IN_PUSHDOWN_BOUND values. Bloom probing uses the
        bounded driver regime only (no Spark handle inside query
        planning); over-bound tables keep range pruning."""

        @staticmethod
        def _lit_ok(v) -> bool:
            return (isinstance(v, (int, float, str))
                    and not isinstance(v, bool))

        @staticmethod
        def _lit_norm(v):
            """Normalize a pushed literal to the engine's comparable
            form, or None = unpushable (VERDICT r12 #3).

            - int/float/str: as-is (the footer-stat domain).
            - datetime.date -> ISO string: date partition tokens ARE
              ISO strings and code-point order is date order, so
              ``ds >= date'...'`` on a date-partitioned table prunes
              exactly like its string form. Footer stats for date
              columns are never recorded (non-str/int/float), and
              bloom sidecars omit date columns entirely (_bloom_key
              indexes int/str only), so the string form can never
              falsely exclude.
            - AWARE datetime.datetime -> sortable UTC ISO string
              (r14, VERDICT r13 #5): Spark pushes timestamp
              literals tz-aware (the internal value is an absolute
              instant), so the normalized form shares the domain
              _utc_token records for timestamp partition tokens —
              ``ts >= timestamp'...'`` on a timestamp-partitioned
              table prunes. A NAIVE datetime (no instant without a
              zone) pushes RAW and stays inert.
            - Decimal: pushed RAW. Footer stats for decimal columns
              land as directionally-widened floats (r14,
              _footer_stats), and Python compares Decimal against
              float exactly — so decimal range predicates prune
              with no conversion of the literal."""
            import datetime as _dt
            import decimal as _dec
            if isinstance(v, bool) or v is None:
                return None
            if isinstance(v, (int, float, str)):
                return v
            if isinstance(v, _dt.datetime):  # BEFORE date: subclass
                if v.tzinfo is None:
                    return v  # zone-less: inert (type guards hold)
                return _utc_iso(v)  # the shared token formatter
            if isinstance(v, _dt.date):
                return v.isoformat()
            if isinstance(v, _dec.Decimal):
                return v
            return None

        @staticmethod
        def _prefix_upper(s: str) -> str | None:
            for i in range(len(s) - 1, -1, -1):
                if ord(s[i]) < 0x10FFFF:
                    return s[:i] + chr(ord(s[i]) + 1)
            return None  # pragma: no cover - all-U+10FFFF prefix

        def pushFilters(self, filters):
            from pyspark.sql.datasource import (
                EqualNullSafe, EqualTo, GreaterThan,
                GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
                LessThanOrEqual, StringStartsWith)

            conjs: list[tuple] = []
            ins: list[tuple] = []
            rng = {GreaterThan: ">", GreaterThanOrEqual: ">=",
                   LessThan: "<", LessThanOrEqual: "<="}
            for f in filters:
                attr = getattr(f, "attribute", None)
                if attr is None or len(attr) != 1:
                    continue  # nested column paths don't prune
                col = attr[0]
                if isinstance(f, (EqualTo, EqualNullSafe)):
                    if f.value is None:
                        if isinstance(f, EqualNullSafe):
                            conjs.append((col, "isnull", None))
                        # EqualTo(col, NULL) matches nothing, but
                        # Spark folds that before pushdown; no claim
                    elif (nv := self._lit_norm(f.value)) is not None:
                        conjs.append((col, "=", nv))
                elif type(f) in rng and \
                        (nv := self._lit_norm(f.value)) is not None:
                    conjs.append((col, rng[type(f)], nv))
                elif isinstance(f, In):
                    vals = [nv for v in f.value
                            if (nv := self._lit_norm(v)) is not None]
                    # NULL in-list values match nothing; dropping
                    # them from the union is exact. Values of
                    # unrecognized types make the whole list
                    # unprunable (a file might match one of them).
                    if (vals and len(list(f.value)) == len(vals)
                            and len(vals) <= _IN_PUSHDOWN_BOUND):
                        ins.append((col, vals))
                elif isinstance(f, IsNull):
                    conjs.append((col, "isnull", None))
                elif isinstance(f, IsNotNull):
                    conjs.append((col, "notnull", None))
                elif (isinstance(f, StringStartsWith)
                        and isinstance(f.value, str) and f.value):
                    conjs.append((col, ">=", f.value))
                    ub = self._prefix_upper(f.value)
                    if ub is not None:
                        conjs.append((col, "<", ub))
            self._conjuncts, self._in_lists = conjs, ins
            return filters  # all re-applied: pushdown = IO skipping

    class TxLogBatchDataSource(DataSource):
        """``spark.read.format("txlog").load(root)`` — the batch
        twin of txlogstream/txlogcdf; register with
        spark.dataSource.register(TxLogBatchDataSource) (or
        ``txlog.register(spark)``). Options: path (or the load()
        arg), version (time travel), timestamp (unix seconds,
        TIMESTAMP AS OF), partition_bytes, pushdown. Schema = the
        table's recorded logical schema at the resolved version.
        ``spark.sql.python.filterPushdown.enabled`` must be true
        for the default reader (session.py sets it; Spark refuses
        a pushFilters-implementing reader otherwise) —
        ``.option("pushdown", "false")`` drops to the plain
        reader for sessions that cannot enable the conf (correct,
        just unpruned)."""

        @classmethod
        def name(cls) -> str:
            return "txlog"

        def _resolve(self):
            # pin (root, snapshot) ONCE per source instance so
            # schema() and reader() agree even if commits land
            # between planning calls
            if not hasattr(self, "_pinned"):
                root = self.options["path"]
                version = self.options.get("version")
                ts = self.options.get("timestamp")
                if version is not None and ts is not None:
                    raise ValueError(
                        "txlog: pass version OR timestamp, not both")
                v = (version_at(root, float(ts)) if ts is not None
                     else int(version) if version is not None
                     else None)
                self._pinned = (root, snapshot(root, v))
            return self._pinned

        def schema(self):
            from pyspark.sql.types import StructType as _ST

            _root, snap = self._resolve()
            if not snap.get("schema"):
                raise ValueError(
                    "txlog: batch format needs a recorded table "
                    "schema; commit data first (or use "
                    "txlog.read() for pre-schema-tracking tables)")
            return _ST.fromJson(json.loads(snap["schema"]))

        def reader(self, schema) -> TxLogPlainBatchReader:
            root, snap = self._resolve()
            cls = (TxLogPlainBatchReader
                   if str(self.options.get(
                       "pushdown", "true")).lower() == "false"
                   else TxLogBatchReader)
            return cls(self.options, schema, snap, root)

        def writer(self, schema, overwrite: bool):
            return TxLogBatchWriter(self.options, schema, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return TxLogStreamNativeWriter(self.options, schema,
                                           overwrite)

        def streamReader(self, schema) -> TxLogParallelStreamReader:
            # ONE format name serves the whole matrix:
            # readStream.format("txlog") is txlogstream's parallel
            # reader verbatim (same options/contract; the dedicated
            # name remains for existing pipelines). The Simple
            # fallback stays txlogstream-only — this surface is
            # executor-parallel, full stop.
            return TxLogParallelStreamReader(self.options, schema)

    class TxLogWriteMessage(WriterCommitMessage):
        """One writer task's staged add actions (paths relative to
        the table root; empty for a zero-row task)."""

        def __init__(self, adds: list[dict]):
            self.adds = adds

    class TxLogBatchWriter(DataSourceArrowWriter):
        """``df.write.format("txlog").mode("append"|"overwrite")
        .save(root)`` — the WRITE half of the native source, the
        same transactional contract as append()/overwrite() with
        the data path on the Arrow writer API: each task streams
        its RecordBatches into ONE parquet file directly under the
        table root (invisible until the commit file lands — the
        log IS the visibility boundary, so no staging dir is
        needed), computes the add action's footer stats/null
        counts there, builds the file's bloom sidecar when the
        table declares an index, and ships ONLY metadata back in
        its commit message. commit() then CAS-claims the version
        exactly like the function API; abort() (and vacuum, for
        crashed tasks) reclaims staged files.

        Parity with append()'s contract, checked AT PLAN TIME
        (construction runs before any task): schema enforcement
        via the same _schema_check rules (.option("merge_schema",
        "true") to evolve, with _evolved_colmap physical-name
        allocation on mapped tables); column-mapped tables write
        PHYSICAL names (batch columns rename before hitting
        parquet, exactly _stage_write's projection).

        HIVE-PARTITIONED tables write natively too (int/string
        partition columns): each task routes its batches by
        distinct partition-value combo into one lazily opened file
        per (task, combo) under ``col=value`` dirs —
        _stage_write's layout, partition columns in directory
        names only, tokens quote()-escaped so both this engine's
        parser and Spark's partition discovery decode them; pass
        ``.option("partition_by", "a,b")`` on the creating write
        or an overwrite (appends inherit the recorded spec and
        refuse a different one).

        CHECK constraints whose predicate parses COMPLETELY as
        recognized ``col OP literal`` conjuncts (the engine's own
        _parse_conjuncts grammar) are ENFORCED in the arrow tasks
        (r13): per-batch vectorized compares with SQL CHECK
        NULL-passes semantics and Spark's NaN total order; a
        violating batch fails its task, so nothing commits —
        enforcement parity with append(). Non-conjunct constraints
        (ORs, functions, col-to-col) and generated columns still
        REFUSE — those need Spark SQL over the incoming frame,
        which the arrow task path cannot run, and silent
        unenforcement would be worse; so do a partition layout
        combined with column mapping, and non-int/string/date
        partition column types; use txlog.append()/overwrite() for
        them. mode("overwrite") resets schema/colmap/layout
        exactly like overwrite().

        Task retries and speculative duplicates leave at most an
        unreferenced uuid-named file vacuum reclaims after
        retention; the winning attempt's message is the only one
        commit() ever sees."""

        def __init__(self, options, schema, overwrite: bool):
            self.root = options["path"]
            self.overwrite = overwrite
            self.merge_schema = (
                str(options.get("merge_schema", "false")).lower()
                == "true")
            self.checkpoint_every = int(options.get(
                "checkpoint_every", 10))
            self.max_retries = int(options.get("max_retries", 20))
            snap0 = snapshot(self.root)
            # GENERATED columns (r14, VERDICT r13 #6): expressions
            # the PROVEN grammar compiles (_arrow_expr_compile —
            # arithmetic / CASE / narrow CASTs over batch columns)
            # compute in the arrow tasks with append()'s exact
            # semantics (omitted -> computed, provided -> null-safe
            # validated). Anything the compiler can't prove still
            # refuses — a silently wrong generated value (worse: a
            # wrong generated PARTITION value) beats no native path
            self._gen_arrow: list[tuple] = []
            gen = snap0.get("generated") or {}
            if gen:
                if snap0.get("colmap"):
                    raise ValueError(
                        f"txlog: the table under {self.root} "
                        "combines generated columns with column "
                        "mapping — use txlog.append()/overwrite()")
                rec_types = _schema_types(snap0)
                bad = []
                for c, gexpr in sorted(gen.items()):
                    fn = _arrow_expr_compile(gexpr, rec_types)
                    if fn is None:
                        bad.append(c)
                    else:
                        self._gen_arrow.append((c, gexpr, fn))
                if bad:
                    raise ValueError(
                        f"txlog: generated columns {bad} on the "
                        f"table under {self.root} use expressions "
                        "the arrow task path cannot prove (only "
                        "arithmetic / CASE / narrow CASTs over "
                        "batch columns compile) — use "
                        "txlog.append()/overwrite()")
                inc_names = {f.name for f in schema.fields}
                if snap0.get("schema") and \
                        any(c not in inc_names for c in gen):
                    # the frame omits generated columns (the normal
                    # shape — append() computes them too): extend
                    # the schema in RECORDED order before the
                    # schema check; the tasks compute the values
                    from pyspark.sql.types import StructType as _SG
                    inc = {f.name: f for f in schema.fields}
                    ext = []
                    for f in _SG.fromJson(
                            json.loads(snap0["schema"])).fields:
                        if f.name in inc:
                            ext.append(inc.pop(f.name))
                        elif f.name in gen:
                            ext.append(f)
                    ext.extend(inc.values())
                    schema = _SG(ext)
            # CHECK constraints whose predicate parses COMPLETELY
            # as recognized ``col OP literal`` conjuncts (the
            # engine's own _parse_conjuncts grammar) validate
            # arrow-side per batch (r13, VERDICT r12 #4) — NULL
            # passes, SQL CHECK semantics, a violating batch fails
            # its task so nothing commits. Anything the parser
            # can't prove complete still refuses: silently
            # unenforced would be worse.
            self._arrow_constraints: list[tuple] = []
            unsupported = []
            for cname, cexpr in sorted(
                    (snap0.get("constraints") or {}).items()):
                conjs = _parse_conjuncts(cexpr)
                if conjs and len(conjs) == \
                        len(_split_top_and(cexpr)):
                    self._arrow_constraints.append(
                        (cname, cexpr, conjs))
                else:
                    unsupported.append(cname)
            if unsupported:
                raise ValueError(
                    f"txlog: the table under {self.root} has CHECK "
                    f"constraints {unsupported} the arrow task "
                    "path cannot prove (only complete AND-of-"
                    "``col OP literal`` predicates validate "
                    "natively) — use txlog.append()/overwrite()")
            opt_spec = [c.strip() for c in str(options.get(
                "partition_by", "")).split(",") if c.strip()]
            creating = (snap0.get("schema") is None
                        and not snap0["files"])
            self._creating = creating
            if self.overwrite or creating:
                self._spec = opt_spec
            else:
                recorded = snap0.get("partition_by") or []
                if opt_spec and opt_spec != recorded:
                    raise ValueError(
                        f"table under {self.root} is partitioned "
                        f"by {recorded}; an append cannot change "
                        f"the layout to {opt_spec}")
                self._spec = recorded
            if self.overwrite:
                self._schema_rec = _schema_check_struct(
                    schema, None, False)
                self._new_cmap: dict | None = {}
                eff_cmap: dict | None = None
            else:
                self._schema_rec = _schema_check_struct(
                    schema, snap0.get("schema"), self.merge_schema)
                self._new_cmap = _evolved_colmap(
                    snap0, self._schema_rec)
                eff_cmap = (self._new_cmap
                            if self._new_cmap is not None
                            else snap0.get("colmap"))
            self._write_cmap = {
                c: p for c, p in (eff_cmap or {}).items()
                if c != p}
            # every batch is CAST to this schema before it hits
            # parquet (physical names, declared types): Spark's
            # batches already conform (zero-copy cast), and a
            # hand-fed or drifting batch lands the recorded types
            # instead of poisoning the table with mismatched files
            from pyspark.sql.types import StructField as _SF
            from pyspark.sql.types import StructType as _ST2
            self._write_schema_json = _ST2(
                [_SF(self._write_cmap.get(f.name, f.name),
                     f.dataType, True)
                 for f in schema.fields]).json()
            if self._spec and self._write_cmap:
                raise ValueError(
                    "txlog: the native writer does not combine a "
                    "partition layout with column mapping — use "
                    "txlog.append()/overwrite()")
            if self._spec:
                by_name = {f.name: f for f in schema.fields}
                # Spark's own DataFrameWriter refuses all-column
                # partitioning; _stage_write inherits that guard but
                # the task-side router would drop_columns() down to a
                # ZERO-column table — pyarrow then records 0 rows in
                # the file while the task counts len(data), silently
                # losing every row behind an add action that claims
                # rows > 0. Refuse at plan time instead.
                if set(self._spec) >= set(by_name):
                    raise ValueError(
                        "txlog: partition_by cannot cover every "
                        "column of the write schema (no data "
                        "columns would remain) — Spark's writer "
                        "refuses this too")
                for c in self._spec:
                    t = (by_name[c].dataType.simpleString()
                         if c in by_name else "<missing>")
                    if t not in ("tinyint", "smallint", "int",
                                 "bigint", "string", "date"):
                        raise ValueError(
                            f"txlog: native-writer partition "
                            f"column {c} has type {t}; only "
                            "int/string/date partition columns "
                            "are supported — use txlog.append()")
            self._bloom = snap0.get("bloom")
            if self._arrow_constraints:
                # plan-time dry run on a ZERO-ROW table of the write
                # schema: an arrow kernel that cannot compare the
                # constraint literal against the column type refuses
                # HERE with a clear message, not mid-task
                import pyarrow as pa
                from pyspark.sql.pandas.types import to_arrow_schema
                from pyspark.sql.types import StructType as _ST3
                probe = pa.Table.from_batches([], schema=(
                    to_arrow_schema(_ST3.fromJson(json.loads(
                        self._write_schema_json)))))
                try:
                    self._validate_constraints(probe)
                except ConstraintViolation:  # pragma: no cover
                    pass  # zero rows cannot violate
                except Exception as e:
                    raise ValueError(
                        f"txlog: a CHECK constraint on the table "
                        f"under {self.root} does not evaluate "
                        f"against the write schema in arrow tasks "
                        f"({e}) — use txlog.append()/overwrite()")
            if self._gen_arrow:
                # plan-time dry run on a ZERO-ROW batch shaped like
                # the frame Spark will feed: an expression that
                # references a missing column or hits an arrow
                # kernel gap refuses HERE, not mid-task
                import pyarrow as pa
                from pyspark.sql.pandas.types import to_arrow_schema
                from pyspark.sql.types import StructType as _ST5
                feed = to_arrow_schema(_ST5(
                    [f for f in schema.fields
                     if f.name in inc_names]))
                empty = pa.RecordBatch.from_arrays(
                    [pa.array([], type=f.type) for f in feed],
                    schema=feed)
                try:
                    self._cast_batch(
                        self._apply_generated_arrow(empty))
                except Exception as e:
                    raise ValueError(
                        f"txlog: the generated columns on the "
                        f"table under {self.root} do not evaluate "
                        f"against the write schema in arrow tasks "
                        f"({e}) — use txlog.append()/overwrite()")

        def _finish_file(self, rel: str, rows: int,
                         part: dict | None) -> dict:
            """The add action for a just-written file: footer
            stats/null counts plus the bloom sidecar when the table
            declares an index (per-task consolidated {file: entry}
            group JSON — the same ref shape _build_bloom_sidecars
            writes; OPTIMIZE / back-fill re-consolidate later)."""
            dst = os.path.join(self.root, rel)
            add = {"path": rel, "bytes": os.path.getsize(dst),
                   "rows": rows, "stats": _footer_stats(dst),
                   "nulls": _footer_nulls(dst)}
            if part is not None:
                add["partition"] = part
            if self._bloom and self._bloom.get("cols"):
                sc = _bloom_sidecar(
                    dst, list(self._bloom["cols"]),
                    self._bloom.get("fpp", 0.01),
                    self._bloom.get("max_ndv", 100_000),
                    self._write_cmap)
                if sc is not None:
                    base = os.path.basename(rel)
                    os.makedirs(os.path.join(self.root, _BLOOM_DIR),
                                exist_ok=True)
                    brel = f"{_BLOOM_DIR}/group-{uuid.uuid4().hex}.json"
                    final = os.path.join(self.root, brel)
                    btmp = f"{final}.tmp-{uuid.uuid4().hex}"
                    with open(btmp, "w") as fh:
                        json.dump({base: sc}, fh)
                        fh.flush()
                        os.fsync(fh.fileno())
                    os.replace(btmp, final)
                    add["bloom"] = {"path": brel, "key": base}
            return add

        def _cast_batch(self, batch):
            """Conform one arrow batch to the declared write schema
            — physical column names, declared types, declared order.
            A batch that already conforms casts zero-copy."""
            import pyarrow as pa

            target = getattr(self, "_target_arrow", None)
            if target is None:
                from pyspark.sql.pandas.types import to_arrow_schema
                from pyspark.sql.types import StructType as _ST
                target = self._target_arrow = to_arrow_schema(
                    _ST.fromJson(json.loads(
                        self._write_schema_json)))
            if batch.schema == target:
                return batch
            names = list(batch.schema.names)
            inv = {p: c for c, p in self._write_cmap.items()}
            cols = []
            for f in target:
                # ALWAYS by logical name (a reordered batch maps
                # correctly; a missing column fails loudly instead
                # of landing under the wrong physical name)
                logical = inv.get(f.name, f.name)
                cols.append(
                    batch.column(names.index(logical))
                    .cast(f.type))
            return pa.RecordBatch.from_arrays(cols, schema=target)

        def _apply_generated_arrow(self, batch):
            """GENERATED ALWAYS AS in the arrow task (r14, VERDICT
            r13 #6) — append()'s _apply_generated contract,
            task-side: a column the batch OMITS computes from its
            recorded expression (the compiled pyarrow evaluator);
            one it PROVIDES validates null-safe equality against
            the recomputation, so a writer can never land a value
            contradicting the declaration. Runs BEFORE _cast_batch
            (which projects the full write schema by name)."""
            if not self._gen_arrow:
                return batch
            import pyarrow as pa
            import pyarrow.compute as pc
            for c, gexpr, fn in self._gen_arrow:
                computed = fn(batch)
                names = list(batch.schema.names)
                if c in names:
                    provided = batch.column(names.index(c))
                    comp = pc.cast(computed, provided.type,
                                   safe=False)
                    eq = pc.or_(
                        pc.and_(pc.is_null(provided),
                                pc.is_null(comp)),
                        pc.fill_null(pc.equal(provided, comp),
                                     False))
                    if batch.num_rows and not pc.min(eq).as_py():
                        raise ConstraintViolation(
                            f"generated column {c!r} ({gexpr}) is "
                            f"contradicted by the write")
                else:
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns) + [computed],
                        names=names + [c])
            return batch

        def _validate_constraints(self, data) -> None:
            """Enforce the table's conjunct-shaped CHECK constraints
            on one cast batch/table (PHYSICAL names), NULL-passes
            SQL semantics: a row violates only when a conjunct
            evaluates FALSE. NaN follows Spark's total order (NaN
            above every number): it passes lower-bound conjuncts,
            fails upper bounds and equality — pc compare is IEEE
            (all-false on NaN), so lower bounds OR in is_nan."""
            if not self._arrow_constraints:
                return
            import pyarrow as pa
            import pyarrow.compute as pc
            ops = {"<": pc.less, "<=": pc.less_equal,
                   ">": pc.greater, ">=": pc.greater_equal,
                   "=": pc.equal, "==": pc.equal}
            names = list(data.schema.names)
            for cname, cexpr, conjs in self._arrow_constraints:
                for col, op, lit in conjs:
                    pcol = self._write_cmap.get(col, col)
                    if pcol not in names:
                        # INVARIANT (VERDICT r13 nit): _cast_batch
                        # projects EVERY physical schema column
                        # before validation runs, so absence can
                        # only be a wiring bug — fail loudly, never
                        # silently pass a constraint
                        raise AssertionError(
                            f"constraint {cname!r} references "
                            f"column {pcol!r} absent from the cast "
                            f"batch — writer wiring bug")
                    a = data.column(names.index(pcol))
                    if op == "isnull":
                        bad = a.null_count < len(a)
                    elif op == "notnull":
                        bad = a.null_count > 0
                    else:
                        ok = ops[op](a, lit)
                        if (pa.types.is_floating(a.type)
                                and op in (">", ">=")):
                            ok = pc.or_kleene(ok, pc.is_nan(a))
                        bad = bool(pc.any(
                            pc.invert(pc.fill_null(ok, True)),
                            min_count=0).as_py())
                    if bad:
                        raise ConstraintViolation(
                            f"constraint {cname!r} ({cexpr}) is "
                            f"violated by the write")

        def write(self, iterator):
            import pyarrow.parquet as pq

            if self._spec:
                return self._write_partitioned(iterator)
            name = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(self.root, name + ".tmp")
            writer = None
            rows = 0
            try:
                for batch in iterator:
                    batch = self._cast_batch(
                        self._apply_generated_arrow(batch))
                    self._validate_constraints(batch)
                    if writer is None:
                        os.makedirs(self.root, exist_ok=True)
                        writer = pq.ParquetWriter(tmp, batch.schema)
                    writer.write_batch(batch)
                    rows += batch.num_rows
            finally:
                if writer is not None:
                    writer.close()
            if rows == 0:
                if writer is not None:
                    os.unlink(tmp)
                return TxLogWriteMessage([])
            os.replace(tmp, os.path.join(self.root, name))
            return TxLogWriteMessage([
                self._finish_file(name, rows, None)])

        # Open ParquetWriters per task are BOUNDED: past the cap the
        # longest-open combo's file finalizes and a later batch for
        # that combo simply starts another file (multiple files per
        # partition are always legal) — a task fed thousands of
        # distinct partition values holds ~cap column writers, not
        # one per value. Sort the input by the partition columns to
        # land one file per (task, combo) anyway.
        _MAX_OPEN_PART_WRITERS = 64

        def _write_partitioned(self, iterator):
            # hive routing ON the task: each batch splits by its
            # distinct partition-value combos and streams into a
            # lazily opened ParquetWriter per combo; partition
            # columns live in the directory names only, exactly
            # _stage_write's layout
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
            from urllib.parse import quote

            open_files: dict[str, list] = {}  # key -> [w, tok, rows, rel]
            adds: list[dict] = []

            def _finalize(key: str) -> None:
                w, tok, rows, rel = open_files.pop(key)
                w.close()
                tmp = os.path.join(self.root, rel + ".tmp")
                if rows == 0:
                    os.unlink(tmp)
                    return
                os.replace(tmp, os.path.join(self.root, rel))
                adds.append(self._finish_file(rel, rows, tok))

            try:
                for batch in iterator:
                    cast = self._cast_batch(
                        self._apply_generated_arrow(batch))
                    self._validate_constraints(cast)
                    tbl = pa.Table.from_batches([cast])
                    combos = (tbl.select(self._spec)
                              .group_by(self._spec).aggregate([])
                              .to_pylist())
                    for combo in combos:
                        mask = None
                        for c in self._spec:
                            v = combo[c]
                            m = (pc.is_null(tbl.column(c))
                                 if v is None
                                 else pc.fill_null(pc.equal(
                                     tbl.column(c), v), False))
                            mask = m if mask is None \
                                else pc.and_(mask, m)
                        data = (tbl.filter(mask)
                                .drop_columns(list(self._spec)))
                        rel_dir = "/".join(
                            f"{c}={_PART_NULL if combo[c] is None else quote(str(combo[c]), safe='')}"
                            for c in self._spec)
                        st = open_files.get(rel_dir)
                        if st is None:
                            if len(open_files) >= \
                                    self._MAX_OPEN_PART_WRITERS:
                                _finalize(next(iter(open_files)))
                            os.makedirs(os.path.join(
                                self.root, rel_dir), exist_ok=True)
                            rel = (f"{rel_dir}/part-"
                                   f"{uuid.uuid4().hex}.parquet")
                            w = pq.ParquetWriter(
                                os.path.join(self.root,
                                             rel + ".tmp"),
                                data.schema)
                            tok = {c: (None if combo[c] is None
                                       else str(combo[c]))
                                   for c in self._spec}
                            st = open_files[rel_dir] = \
                                [w, tok, 0, rel]
                        st[0].write_table(data)
                        st[2] += len(data)
                for key in list(open_files):
                    _finalize(key)
            finally:
                for st in open_files.values():
                    st[0].close()  # error path only: leave tmps
            return TxLogWriteMessage(adds)

        def commit(self, messages):
            adds = [a for m in messages if m is not None
                    for a in m.adds]
            if self.overwrite:
                for _ in range(self.max_retries):
                    snap = snapshot(self.root)
                    entry = {
                        "op": "overwrite", "ts": time.time(),
                        "actions": ([{"remove": {"path": p}}
                                     for p in sorted(snap["files"])]
                                    + [{"add": a} for a in adds]),
                        "schema": self._schema_rec,
                        "partition_by": self._spec,
                        "colmap": {}, "phys_dropped": [],
                        "generated": {}}
                    if _try_commit(self.root, snap["version"] + 1,
                                   entry):
                        _maybe_checkpoint(self.root,
                                          snap["version"] + 1,
                                          self.checkpoint_every)
                        return
                raise CommitConflict(
                    f"overwrite lost the version race "
                    f"{self.max_retries} times under {self.root}")
            entry = {"op": "append", "ts": time.time(),
                     "actions": [{"add": a} for a in adds]}
            if self._schema_rec is not None:
                entry["schema"] = self._schema_rec
            if self._creating and self._spec:
                entry["partition_by"] = self._spec
            if self._new_cmap is not None:
                entry["colmap"] = self._new_cmap
                _mark_feature(entry, snapshot(self.root),
                              "column-mapping")
            for _ in range(self.max_retries):
                head = _list_versions(self.root)
                v = (head[-1] if head else 0) + 1
                if _try_commit(self.root, v, entry):
                    _maybe_checkpoint(self.root, v,
                                      self.checkpoint_every)
                    return
            raise CommitConflict(
                f"append lost the version race "
                f"{self.max_retries} times under {self.root}")

        def abort(self, messages):
            for m in messages:
                if m is None:
                    continue
                for a in m.adds:
                    for rel in (a["path"],
                                (a.get("bloom") or {}).get("path")):
                        if not rel:
                            continue
                        try:
                            os.unlink(os.path.join(self.root, rel))
                        except OSError:
                            pass

    class TxLogStreamNativeWriter(TxLogBatchWriter,
                                  DataSourceStreamArrowWriter):
        """``df.writeStream.format("txlog").option("path", root)``
        — the NATIVE streaming sink, completing the format matrix
        (batch read/write + stream read/CDF + stream write): the
        batch writer's task machinery verbatim (arrow batches ->
        uuid-named parquet + footer stats + bloom sidecars +
        hive-partition routing, all executor-side), with the
        foreachBatch sink's EXACTLY-ONCE contract on the epoch
        boundary: commit(messages, batchId) reads the snapshot's
        per-app ``txn`` watermark and makes a replayed micro-batch
        a NO-OP (its freshly staged files are left unreferenced for
        vacuum — data lands twice on disk at worst, never twice in
        the table), then commits one ``stream-append`` carrying
        app_id/batch_id exactly like stream_sink().

        Options: path, app_id (the txn watermark key — one per
        query, default "stream"), plus the batch writer's
        (merge_schema, partition_by on the creating batch,
        checkpoint_every, max_retries). The same refusals apply
        (constraints/generated/colmap+partition — stream_sink()
        handles those tables); outputMode("complete") refuses
        (append-only sink)."""

        def __init__(self, options, schema, overwrite: bool):
            if overwrite:
                raise ValueError(
                    "txlog: the streaming sink is append-only — "
                    "use outputMode('append')")
            super().__init__(options, schema, False)
            self.app_id = options.get("app_id", "stream")

        def commit(self, messages, batchId: int) -> None:
            snap0 = snapshot(self.root)
            if snap0["txn"].get(self.app_id, -1) >= batchId:
                return  # replayed micro-batch: already committed
            adds = [a for m in messages if m is not None
                    for a in m.adds]
            entry = {"op": "stream-append", "ts": time.time(),
                     "app_id": self.app_id, "batch_id": batchId,
                     "actions": [{"add": a} for a in adds]}
            if self._schema_rec is not None:
                entry["schema"] = self._schema_rec
            if self._new_cmap is not None and not self.overwrite:
                # schema evolution on a column-mapped table must
                # re-record the mapping exactly like append() does
                entry["colmap"] = self._new_cmap
                _mark_feature(entry, snap0, "column-mapping")
            if self._creating and self._spec:
                entry["partition_by"] = self._spec
            for attempt in range(self.max_retries):
                if attempt:
                    # a concurrent instance of the SAME app_id
                    # (driver failover / zombie run) that passed the
                    # entry check simultaneously may have won the
                    # version race we just lost — re-read the txn
                    # watermark before retrying or this batchId
                    # lands twice, breaking exactly-once
                    if snapshot(self.root)["txn"].get(
                            self.app_id, -1) >= batchId:
                        return
                head = _list_versions(self.root)
                v = (head[-1] if head else 0) + 1
                if _try_commit(self.root, v, entry):
                    _maybe_checkpoint(self.root, v,
                                      self.checkpoint_every)
                    # one writer instance serves every epoch of the
                    # run: schema/colmap/layout are recorded by the
                    # FIRST commit only
                    self._schema_rec = None
                    self._new_cmap = None
                    self._creating = False
                    return
            raise CommitConflict(
                f"stream batch {batchId} lost the version race "
                f"{self.max_retries} times under {self.root}")

        def abort(self, messages, batchId: int) -> None:
            TxLogBatchWriter.abort(self, messages)

except ImportError:  # pragma: no cover - pyspark<4 fallback
    TxLogFilePartition = None  # type: ignore[assignment]
    TxLogParallelStreamReader = None  # type: ignore[assignment]
    TxLogStreamReader = None  # type: ignore[assignment]
    TxLogStreamDataSource = None  # type: ignore[assignment]
    TxLogCdfPartition = None  # type: ignore[assignment]
    TxLogCdfStreamReader = None  # type: ignore[assignment]
    TxLogCdfStreamDataSource = None  # type: ignore[assignment]
    TxLogCdfBatchReader = None  # type: ignore[assignment]
    TxLogBatchPartition = None  # type: ignore[assignment]
    TxLogPlainBatchReader = None  # type: ignore[assignment]
    TxLogBatchReader = None  # type: ignore[assignment]
    TxLogBatchDataSource = None  # type: ignore[assignment]
    TxLogWriteMessage = None  # type: ignore[assignment]
    TxLogBatchWriter = None  # type: ignore[assignment]
    TxLogStreamNativeWriter = None  # type: ignore[assignment]


def register(spark) -> None:
    """Register all three txlog Spark formats on a session: batch
    ``format("txlog")`` (read, write, stream-read AND the native
    streaming sink), the streaming source ``txlogstream``, and the
    row-level change stream ``txlogcdf``. Also SHIPS the package
    source to Spark's Python workers (addPyFile zip): registered
    data sources pickle by module REFERENCE, so a worker spawned
    by a driver whose cwd isn't the repo root would otherwise die
    with ModuleNotFoundError the first time it plans or reads a
    txlog scan."""
    if TxLogBatchDataSource is None:  # pragma: no cover
        raise ImportError("txlog formats need pyspark >= 4")
    _ship_package(spark)
    spark.dataSource.register(TxLogBatchDataSource)
    spark.dataSource.register(TxLogStreamDataSource)
    spark.dataSource.register(TxLogCdfStreamDataSource)


def _ship_package(spark) -> None:
    """Make ``gcp_data_engineering_workshop_spark`` importable in
    every Python worker of this session regardless of the driver's
    cwd/sys.path: zip the package source once and addPyFile it
    (Spark puts the file dir on worker PYTHONPATH — the standard
    dependency-shipping path, idempotent per session)."""
    key = "_txlog_pkg_shipped"
    sc = spark.sparkContext
    if getattr(sc, key, False):
        return
    import zipfile

    import gcp_data_engineering_workshop_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="txlogpkg_"),
        "gcp_data_engineering_workshop_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(
                        full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    setattr(sc, key, True)


def refresh_stream(spark, src_root: str, dst_root: str, fn=None,
                   app_id: str = "incremental",
                   checkpoint_dir: str | None = None,
                   available_now: bool = True):
    """The STREAMING twin of refresh_incremental() on the native
    formats (the medallion transform hop as one call):
    readStream("txlogstream") over the source, ``fn`` applied to
    the row stream, writeStream("txlog") into the destination with
    the txn-watermark exactly-once epoch contract. Returns the
    started StreamingQuery — ``available_now=True`` (default)
    drains the source's current commits and stops (the continuous
    analog of one refresh_incremental call; re-invoke with the
    same checkpoint_dir to pick up only new commits), False runs
    continuously.

    Contract differences vs the batch refresh: ``fn`` sees plain
    rows (no _commit_version/_commit_op tags — streams are
    row-level), and non-append source commits RAISE through the
    stream source's NonAppendChange instead of being silently
    excluded by include_ops."""
    register(spark)
    df = (spark.readStream.format("txlogstream")
          .option("path", src_root).load())
    if fn is not None:
        df = fn(df)
    wr = (df.writeStream.format("txlog")
          .option("path", dst_root).option("app_id", app_id))
    if checkpoint_dir is not None:
        wr = wr.option("checkpointLocation", checkpoint_dir)
    if available_now:
        wr = wr.trigger(availableNow=True)
    return wr.start()


def read_range(spark, root: str, col: str, lo=None, hi=None,
               version: int | None = None) -> DataFrame:
    """Snapshot read with DATA SKIPPING: resolve the live set, drop
    every file whose footer [min, max] range for ``col`` provably
    misses [lo, hi], read only the survivors, and apply the exact
    residual filter — the Delta-paper read-side use of the same
    per-file stats merge_upsert prunes with. A date-range scan of a
    100 TB date-clustered table opens the week it asks for.

    Conservative rules (all pytest-pinned):
    - a file with NO stat for ``col`` always survives;
    - Spark orders NaN ABOVE every number, so ``col >= lo`` is TRUE
      for NaN rows the footer stats cannot see — for float/double
      columns a lo-only scan therefore skips NOTHING (the residual
      filter still runs; only the IO saving is forfeited). With a
      finite ``hi`` the residual conjunction excludes NaN rows, so
      two-sided and hi-only float scans prune normally;
    - lo/hi of None mean unbounded on that side."""
    from pyspark.sql import functions as F

    if lo is None and hi is None:
        return read(spark, root, version)
    snap = snapshot(root, version)
    base = read(spark, root, version)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    if not snap["files"]:
        return base.where(cond)
    types = _schema_types(snap)
    inv = _inv_colmap(snap)
    eff = {p: _effective_stats(m, types, inv)
           for p, m in snap["files"].items()}
    float_key = any(
        isinstance(e.get(col, [None, None])[0], float)
        for e in eff.values())
    if float_key and hi is None:
        return base.where(cond)  # NaN rule: no safe skip
    keep = []
    for p in snap["files"]:
        st = eff[p].get(col)
        if st is None:
            keep.append(p)
            continue
        f_lo, f_hi = st
        if lo is not None and f_hi < lo:
            continue
        if hi is not None and f_lo > hi:
            continue
        keep.append(p)
    if not keep:
        return base.where(cond).limit(0)
    # surviving files read through the recorded schema — identical
    # NULL-backfill projection to read(), so pruning never changes
    # the result shape on an evolved table (ADVICE r10)
    return _read_files(spark, root, snap, sorted(keep)).where(cond)


def read_where(spark, root: str, condition: str,
               version: int | None = None) -> DataFrame:
    """Snapshot read with GENERAL predicate data skipping (r11):
    read_range's pruning generalized to an arbitrary Spark-SQL
    ``condition`` through the same conservative conjunct analysis
    the predicate DML uses — every file whose effective stats
    (footer [min,max] ranges + exact partition values on a
    partitioned table) provably exclude all recognized
    ``col OP literal`` conjuncts is never opened; survivors get the
    exact residual filter. Equals read().where(condition) by
    construction: pruning only drops files _stat_excludes PROVES
    can't match (NULL/NaN/cross-type rules pytest-pinned), and
    unrecognized predicate shapes simply skip pruning.

    On a hive-partitioned table this is partition pruning: a
    conjunct on a partition column excludes every file of every
    other partition via its [v, v] stat — the directory-level scan
    elimination a 100 TB date/tenant-partitioned layout exists
    for."""
    snap = snapshot(root, version)
    base = read(spark, root, version)
    if not snap["files"]:
        return base.where(condition)
    keep = _files_matching_pred(
        snap, condition, root, spark,
        tz=spark.conf.get("spark.sql.session.timeZone", None))
    if keep is None:
        return base.where(condition)
    if not keep:
        return base.where(condition).limit(0)
    if len(keep) == len(snap["files"]):
        return base.where(condition)
    return _read_files(spark, root, snap, sorted(keep)) \
        .where(condition)
