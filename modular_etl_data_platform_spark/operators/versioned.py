"""Versioned parquet tables: snapshot isolation + time travel without
Delta.

The reference's storage contract is Delta Lake (reference:
requirements.txt:2 delta-spark; time-travel recipe
config/bronze/schema/README.md:83-87) — unavailable in this sandbox, so
this module re-creates the two properties a reader actually depends on,
using Delta's own design reduced to its core (a commit log of file
manifests; public pattern from the Delta Lake paper, VLDB'20):

- **Snapshot isolation for readers**: every write lands NEW data files
  and then publishes a manifest (one JSON file) with an atomic
  exclusive link. Readers resolve a manifest to a fixed file list,
  so a concurrent write can never make a reader see a half-written
  table — the failure mode of plain parquet overwrite.
- **Time travel**: old manifests (and their files) stay until
  ``vacuum``; ``read(version=N)`` reproduces any retained snapshot
  exactly.

- **Multi-writer optimistic concurrency**: commits CLAIM their version
  number with an atomic exclusive ``os.link`` (the filesystem analogue
  of Delta's conditional log put). A lost race rebases: appends and
  overwrites re-attach their already-landed files to the new head;
  upserts and compactions re-derive their content from it (Delta's
  conflict-then-revalidate loop). No interleaving of writers can lose
  a committed version or publish a torn manifest.

Scale notes: a manifest lists file paths, not rows — publishing is O(1)
in data size. ``write`` modes compose with the engine's sinks: ``append``
reuses prior files untouched (no rewrite), ``upsert`` rewrites only via
the merge DataFrame, and files are immutable once published, which is
what makes snapshots free. At warehouse scale you would partition the
data files and store per-file min/max stats in the manifest for skipping
— the hook is the manifest dict, deliberately JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.upsert import merge_dataframes

_MANIFEST_DIR = "_versions"
_DATA_DIR = "files"
#: stats-dict marker for a zero-row file (intersects no predicate)
_EMPTY_MARK = "__empty__"
#: bounded rebase attempts before surfacing the conflict to the caller
_MAX_COMMIT_RETRIES = 20


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed the version this commit targeted.

    Raised to the caller only after the operation's own rebase budget
    (``_MAX_COMMIT_RETRIES``) is exhausted, or immediately by
    ``_publish`` internally (where the write paths catch it and rebase).
    """


class ConstraintViolationError(ValueError):
    """A write's rows (or, for add_constraint, the existing table)
    violate a CHECK constraint; nothing was published."""


def is_versioned_table(path: str) -> bool:
    """Whether ``path`` holds a published versioned table (at least one
    manifest in its commit log). Pure directory probe — unlike the
    ``VersionedTable`` constructor, it never creates directories, so
    callers can dispatch parquet-vs-versioned reads without side
    effects."""
    d = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return False
    return any(n.startswith("v") and n.endswith(".json") for n in os.listdir(d))


class VersionedTable:
    """A parquet table with a manifest-per-version commit log."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        stats_columns: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        #: columns to record per-file min/max for in each manifest
        #: (footer-metadata only); enables read_pruned file skipping
        self.stats_columns = stats_columns or []
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # -- log ------------------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{version:08d}.json")

    def versions(self) -> list[int]:
        names = os.listdir(os.path.join(self.path, _MANIFEST_DIR))
        return sorted(
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _publish(
        self,
        files: list[str],
        schema_json: str,
        meta: dict | None = None,
        prior: dict | None = None,
        expected_base: int | None = None,
    ) -> int:
        """Atomically publish a new version — Delta's optimistic commit
        protocol on a filesystem log: the manifest JSON is written fully
        to a temp name, then CLAIMED with a same-directory ``os.link``
        (atomic, and unlike rename it FAILS with EEXIST if the version
        number is already taken). Readers see the old version or the new
        one, never a torn manifest; two writers racing for the same
        version number — the Delta paper's conflict signal — cannot both
        win. On a lost race ``ConcurrentWriteError`` is raised; the
        write paths rebase and retry with semantics matching their
        operation (see each method). ``expected_base`` pins the version
        this commit's CONTENT was derived from (claiming exactly
        base+1), so a commit can never silently skip over — and thereby
        drop — an interleaved writer's version.

        The schema rides in the manifest so an EMPTY snapshot (files=[],
        a normal state for an all-filtered incremental batch) stays
        readable as a 0-row frame instead of bricking the table.

        ``prior`` is the manifest the write built on (if any): per-file
        stats for files that manifest already lists are CARRIED FORWARD
        verbatim — files are immutable, so their footer stats cannot
        change — and footers are opened only for newly landed files.
        This keeps commit cost O(batch), not O(table): an append to a
        table with 10^5 historical files opens zero of their footers
        (the Delta design — the log carries stats so commits never
        re-scan history)."""
        base = expected_base if expected_base is not None else (self.current_version() or 0)
        version = base + 1
        meta = dict(meta or {})
        if "constraints" not in meta and base:
            # CHECK constraints are table properties: they survive every
            # write mode (including overwrite) unless explicitly changed
            inherited = self._read_manifest(base).get("constraints")
            if inherited:
                meta["constraints"] = inherited
        prior_files = set(prior.get("files", [])) if prior else set()
        prior_stats = prior.get("stats", {}) if prior else {}
        # a file listed by the prior manifest WITHOUT a stats entry had
        # no usable footer min/max — re-reading its footer would find
        # the same nothing, so it is skipped too, not just stat-carriers
        carried = {f: prior_stats[f] for f in files if f in prior_stats}
        fresh = self._file_stats([f for f in files if f not in prior_files])
        manifest = {
            "version": version,
            "files": sorted(files),
            "schema": schema_json,
            "stats": {**carried, **fresh},
            **(meta or {}),
        }
        final = self._manifest_path(version)
        tmp = final + f".tmp{os.getpid()}_{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {version} of {self.path} was committed by another writer"
            )
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return version

    # -- constraints -----------------------------------------------------------
    def constraints(self) -> dict[str, str]:
        """Active CHECK constraints (name -> SQL expression), carried in
        every manifest like Delta table properties."""
        v = self.current_version()
        if v is None:
            return {}
        return dict(self._read_manifest(v).get("constraints", {}))

    def add_constraint(self, name: str, sql_expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (the Delta constraint
        contract): EXISTING data is validated first (one aggregate scan
        — adding a constraint the table already violates must fail, or
        the constraint is a lie), then a new version is published with
        the same files and the constraint recorded; every later write
        validates its landed rows against it for free (the check rides
        the landing write as an Observation — no extra pass). NULL
        evaluations PASS, the SQL CHECK three-valued-logic rule."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no versions in {self.path}")
        bad = (
            self.read()
            .filter(~F.coalesce(F.expr(sql_expr), F.lit(True)))
            .limit(1)
            .count()
        )
        if bad:
            raise ConstraintViolationError(
                f"existing rows violate {name!r}: {sql_expr}"
            )
        m = self._read_manifest(v)
        cons = dict(m.get("constraints", {}))
        cons[name] = sql_expr
        return self._publish(
            m["files"],
            m["schema"],
            {"mode": "add_constraint", "constraints": cons},
            prior=m,
            expected_base=v,
        )

    def drop_constraint(self, name: str) -> int:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no versions in {self.path}")
        m = self._read_manifest(v)
        cons = dict(m.get("constraints", {}))
        cons.pop(name, None)
        return self._publish(
            m["files"],
            m["schema"],
            {"mode": "drop_constraint", "constraints": cons},
            prior=m,
            expected_base=v,
        )

    # -- write paths ----------------------------------------------------------
    def _land_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable data files under a fresh subdirectory
        (never touching published files) and return their paths.

        Active CHECK constraints are enforced HERE, riding the landing
        write as an ``Observation`` — zero additional scan; a violation
        raises BEFORE any manifest publish, so the version simply never
        exists (the landed orphans are vacuumable), which is the
        transactional half of Delta's constraint contract. A row
        violates only when the expression evaluates exactly FALSE
        (NULL passes — SQL CHECK semantics)."""
        cons = self.constraints()
        obs = None
        if cons:
            from pyspark.sql import Observation

            obs = Observation()
            aggs = [
                F.sum(
                    (~F.coalesce(F.expr(e), F.lit(True))).cast("long")
                ).alias(n)
                for n, e in cons.items()
            ]
            df = df.observe(obs, *aggs)
        sub = os.path.join(self.path, _DATA_DIR, uuid.uuid4().hex)
        df.write.parquet(sub)
        if obs is not None:
            violated = {n: c for n, c in obs.get.items() if c}
            if violated:
                raise ConstraintViolationError(
                    f"CHECK constraint(s) violated in {self.path}: "
                    + ", ".join(
                        f"{n} ({cons[n]}): {c} row(s)"
                        for n, c in violated.items()
                    )
                )
        return [
            os.path.join(sub, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        ]

    def _file_stats(self, files: list[str]) -> dict[str, dict]:
        """Per-file min/max for ``stats_columns``, read from the parquet
        FOOTER metadata (pyarrow) — no data scan; this is Delta's
        data-skipping statistic, and at 100 TB it is what lets a point
        or range read open a handful of files instead of the table."""
        if not self.stats_columns:
            return {}
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                # a zero-row file intersects NO predicate: record that
                # explicitly so pruning reads skip it and pruned
                # upserts/compactions carry it forward instead of
                # treating "no stats" as "conservatively rewrite forever"
                out[f] = {_EMPTY_MARK: True}
                continue
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            stats: dict[str, list] = {}
            for col in self.stats_columns:
                if col not in names:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    s = md.row_group(rg).column(names[col]).statistics
                    if s is None or not s.has_min_max:
                        lo = hi = None
                        break
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
                # record NUMERIC ranges only: strings/binaries can be
                # TRUNCATED in parquet footer stats (an underestimated
                # max would wrongly exclude a file — a lost update on
                # the pruned-upsert path), and datetimes/bytes aren't
                # JSON-manifest-safe; non-numeric columns simply stay
                # conservative (never pruned, never mis-pruned)
                if (
                    lo is not None
                    and type(lo) in (int, float)
                    and type(hi) in (int, float)
                ):
                    stats[col] = [lo, hi]
            if stats:
                out[f] = stats
        return out

    @staticmethod
    def _may_intersect(stats_entry: dict | None, column: str, lo, hi) -> bool:
        """Whether a file MAY hold rows with ``column`` in [lo, hi]:
        False for recorded-empty files, True (conservative) when the
        column has no recorded range, else the range-overlap test."""
        entry = stats_entry or {}
        if entry.get(_EMPTY_MARK):
            return False
        if column not in entry:
            return True
        return entry[column][0] <= hi and lo <= entry[column][1]

    def write(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Publish a new version. ``overwrite`` replaces the logical
        contents; ``append`` adds the batch's files to the current
        snapshot's file list (prior files are REUSED, not rewritten).

        Multi-writer: both modes land their files ONCE and rebase on a
        lost commit race without recomputing data. An append's content
        depends on the head it read, so the rebase re-reads the new head
        and re-attaches the same landed files — concurrent appends all
        serialize, none is lost (the blind-append case Delta resolves
        the same way). An overwrite's content is base-independent; it
        just claims the next number."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode {mode!r}")
        landed = self._land_files(df)
        for _ in range(_MAX_COMMIT_RETRIES):
            base = self.current_version() or 0
            prior = None
            files = list(landed)
            if mode == "append" and base:
                prior = self._read_manifest(base)
                files = list(prior["files"]) + files
            try:
                return self._publish(
                    files, df.schema.json(), {"mode": mode},
                    prior=prior, expected_base=base,
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"write({mode}) lost {_MAX_COMMIT_RETRIES} commit races on {self.path}"
        )

    def upsert(
        self,
        batch: DataFrame,
        primary_keys: list[str],
        evolve_schema: bool = False,
    ) -> int:
        """MERGE semantics as a new version (WHEN MATCHED update / NOT
        MATCHED insert — the reference's silver contract). The previous
        snapshot stays readable until vacuumed. ``evolve_schema=True``
        widens to the union schema (Delta's mergeSchema; see
        ``merge_dataframes``) — every version's schema is recorded in
        its own manifest, so old snapshots keep their schema and the new
        one carries the widened one (reads pin the manifest schema, so
        carried-forward files simply null-fill new columns).

        **File pruning** (Delta's MERGE data-skipping): when a primary
        key is among ``stats_columns``, the batch's [min, max] on that
        key selects only the files whose recorded footer range
        intersects it; every other file is carried into the new manifest
        UNTOUCHED (no read, no rewrite, stats carried forward). Safe
        because a match requires equality on every primary key, so a
        row in a file disjoint from the batch's key range can never
        match — a one-day upsert into a year of files rewrites one day.
        Files without recorded stats are conservatively rewritten.

        Multi-writer: the merge's content is derived from the snapshot
        it read, so a lost commit race RE-RUNS the merge against the new
        head (Delta's conflict-then-revalidate loop — a rebase that
        reused the already-merged files could resurrect rows a racing
        writer changed). Orphaned files from lost attempts are cleaned
        by ``vacuum``."""
        for _ in range(_MAX_COMMIT_RETRIES):
            base = self.current_version()
            if base is None:
                merged = merge_dataframes(None, batch, primary_keys, evolve_schema)
                try:
                    return self._publish(
                        self._land_files(merged),
                        merged.schema.json(),
                        {"mode": "upsert"},
                        expected_base=0,
                    )
                except ConcurrentWriteError:
                    continue
            manifest = self._read_manifest(base)
            stats = manifest.get("stats", {})
            prune_col = next(
                (k for k in primary_keys if k in self.stats_columns), None
            )
            touched, untouched = manifest["files"], []
            if prune_col is not None and manifest["files"]:
                row = batch.agg(
                    F.min(prune_col).alias("lo"), F.max(prune_col).alias("hi")
                ).first()  # 2-scalar driver read, same budget as a watermark probe
                lo, hi = row["lo"], row["hi"]
                if lo is not None:
                    touched = [
                        f
                        for f in manifest["files"]
                        if self._may_intersect(stats.get(f), prune_col, lo, hi)
                    ]
                    untouched = [
                        f for f in manifest["files"] if f not in set(touched)
                    ]
            # zero touched files still goes through merge with an EMPTY
            # schema-typed target: the table schema stays the contract
            # (extra batch columns are dropped/raise exactly as a full
            # merge would), instead of the batch schema silently winning
            current = self._read_files(touched, manifest["schema"])
            merged = merge_dataframes(current, batch, primary_keys, evolve_schema)
            try:
                return self._publish(
                    untouched + self._land_files(merged),
                    merged.schema.json(),
                    {"mode": "upsert"},
                    prior=manifest,
                    expected_base=base,
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"upsert lost {_MAX_COMMIT_RETRIES} commit races on {self.path}"
        )

    # -- read paths -----------------------------------------------------------
    def _read_files(self, files: list[str], schema_json: str) -> DataFrame:
        """Read ``files`` pinned to the MANIFEST schema (not whatever
        schema the first footer happens to carry): after a
        schema-evolving upsert that carried old files forward, the old
        files null-fill the new columns — the Delta behavior, where the
        log's schema is authoritative over any one file's. Empty file
        lists return a 0-row frame on the same schema."""
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(schema_json))
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def read(self, version: int | None = None) -> DataFrame:
        """The snapshot at ``version`` (default: latest). Resolving
        through the manifest pins the exact file list — concurrent
        publishes cannot shift the data under the returned frame."""
        v = self.current_version() if version is None else version
        if v is None or not os.path.exists(self._manifest_path(v)):
            raise FileNotFoundError(f"no version {version} in {self.path}")
        manifest = self._read_manifest(v)
        return self._read_files(manifest["files"], manifest["schema"])

    def read_incremental(
        self, since_version: int, version: int | None = None
    ) -> DataFrame:
        """Rows in data files ADDED after ``since_version`` (up to
        ``version``, default head) — the file-level change feed a
        downstream consumer tails instead of re-reading the table:
        ``process(read_incremental(last_seen)); last_seen = head``.

        For an append-only table this is EXACTLY the new rows, at a cost
        proportional to the new data (the manifest diff is a set
        difference over file paths — no I/O). After an upsert/compaction
        it returns the current rows of every REWRITTEN file — a superset
        of the logically-changed rows (file-level granularity; Delta's
        CDF row-level deltas need per-commit change tracking, which the
        manifest log deliberately does not carry). Reads pin the TARGET
        version's schema, so evolved columns appear null-filled for
        pre-evolution consumers' replays."""
        if since_version not in self.versions():
            raise FileNotFoundError(
                f"no version {since_version} in {self.path}"
            )
        v = self.current_version() if version is None else version
        old = set(self._read_manifest(since_version)["files"])
        cur = self._read_manifest(v)
        return self._read_files(
            [f for f in cur["files"] if f not in old], cur["schema"]
        )

    def table_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        primary_keys: list[str] | None = None,
    ) -> DataFrame:
        """ROW-level changes between two snapshots — Delta's CHANGE DATA
        FEED computed ON READ from the manifest diff (the log carries no
        per-commit row tracking, so the feed is derived, not recorded):
        returns the ``to`` schema's columns plus ``_change_type`` in
        ``insert`` / ``update_postimage`` / ``delete`` (deletes carry
        the old row's values, null-filled on evolved columns).

        Cost scales with the CHANGED files only: a file carried by both
        manifests cannot contribute a change, so only the file-set
        difference is read on each side (at 100 TB a one-day MERGE diffs
        one day of files, never the table). Within those files, rows are
        keyed on ``primary_keys`` and full-outer-joined; rows present on
        both sides with identical values (an unchanged neighbor in a
        rewritten file, or a pure compaction) are filtered with a
        null-safe whole-row comparison — a compaction or clustering
        rewrite therefore yields ZERO changes, as it must."""
        if primary_keys is None or not primary_keys:
            raise ValueError("table_changes requires primary_keys")
        if from_version not in self.versions():
            raise FileNotFoundError(f"no version {from_version} in {self.path}")
        v = self.current_version() if to_version is None else to_version
        m_old, m_new = self._read_manifest(from_version), self._read_manifest(v)
        old_only = [f for f in m_old["files"] if f not in set(m_new["files"])]
        new_only = [f for f in m_new["files"] if f not in set(m_old["files"])]
        # both sides read on the NEW schema: evolved columns null-fill
        # on the old side, so pre/post images compare column-for-column
        old = self._read_files(old_only, m_new["schema"])
        new = self._read_files(new_only, m_new["schema"])
        cols = [c for c in new.columns]
        val_cols = [c for c in cols if c not in primary_keys]
        o = old.select(
            *[F.col(k).alias(f"__ok_{k}") for k in primary_keys],
            *[F.col(c).alias(f"__ov_{c}") for c in val_cols],
        )
        n = new.select(
            *[F.col(k).alias(f"__nk_{k}") for k in primary_keys],
            *[F.col(c).alias(f"__nv_{c}") for c in val_cols],
        )
        cond = F.lit(True)
        for k in primary_keys:
            cond = cond & F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        j = o.join(n, cond, "full_outer")
        first_nk = F.col(f"__nk_{primary_keys[0]}")
        first_ok = F.col(f"__ok_{primary_keys[0]}")
        same = F.lit(True)
        for c in val_cols:
            same = same & F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
        change = (
            F.when(first_ok.isNull(), F.lit("insert"))
            .when(first_nk.isNull(), F.lit("delete"))
            .when(same, F.lit(None))  # rewritten-but-unchanged neighbor
            .otherwise(F.lit("update_postimage"))
        )
        out_cols = []
        for c in cols:
            if c in primary_keys:
                out_cols.append(
                    F.coalesce(F.col(f"__nk_{c}"), F.col(f"__ok_{c}")).alias(c)
                )
            else:
                # postimage for insert/update; the old values for delete
                out_cols.append(
                    F.when(
                        first_nk.isNull(), F.col(f"__ov_{c}")
                    ).otherwise(F.col(f"__nv_{c}")).alias(c)
                )
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*out_cols, "_change_type")
        )

    def delete_range(self, column: str, lo, hi) -> int:
        """DELETE with data skipping (Delta's ``DELETE WHERE`` on a
        range predicate): only files whose recorded [min, max] for
        ``column`` intersects [lo, hi] are rewritten with the matching
        rows removed; every other file is carried forward untouched —
        the GDPR-erasure shape, at a cost proportional to the hot range.
        Files with no recorded stats are conservatively rewritten.
        Publishes a new version (prior snapshots retain the rows until
        ``vacuum``, exactly like Delta: deletion becomes durable at
        vacuum time). Rebases over concurrent appends by re-selecting
        against the new head."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no versions in {self.path}")
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        touched = [
            f
            for f in manifest["files"]
            if self._may_intersect(stats.get(f), column, lo, hi)
        ]
        if not touched:
            return v
        untouched = [f for f in manifest["files"] if f not in set(touched)]
        # keep = NOT(lo <= col <= hi), with NULLs KEPT: a null never
        # matches the range predicate, so it is never deleted (the SQL
        # DELETE WHERE three-valued-logic reading)
        kept = self._read_files(touched, manifest["schema"]).filter(
            F.col(column).isNull()
            | (F.col(column) < F.lit(lo))
            | (F.col(column) > F.lit(hi))
        )
        try:
            return self._publish(
                untouched + self._land_files(kept),
                manifest["schema"],
                {"mode": "delete", "column": column},
                prior=manifest,
                expected_base=v,
            )
        except ConcurrentWriteError:
            return self.delete_range(column, lo, hi)

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self.versions()]

    def read_pruned(self, column: str, lo, hi, version: int | None = None) -> DataFrame:
        """Snapshot read that opens ONLY the files whose recorded
        [min, max] for ``column`` intersects [lo, hi] — manifest-level
        file skipping (the Delta data-skipping read path). Files with no
        recorded stats are conservatively kept. The residual filter is
        still applied, so the result equals ``read().filter(...)``
        exactly; only the I/O differs."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no versions in {self.path}")
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        kept = [
            f
            for f in manifest["files"]
            if self._may_intersect(stats.get(f), column, lo, hi)
        ]
        pred = (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
        return self._read_files(kept, manifest["schema"]).filter(pred)

    def compact(
        self,
        target_files: int = 1,
        order_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot as ``target_files`` files and
        publish it as a new version (the OPTIMIZE analogue for the
        versioned layer): readers of prior versions are untouched, the
        small-file history stays time-travelable until vacuum.

        ``order_by`` range-partitions + sorts the rewrite on those
        columns (linear clustering): each output file covers a narrow
        range of the LEADING key, so the footer min/max recorded for
        ``stats_columns`` become maximally selective and ``read_pruned``
        point/range reads open ~1 file.

        ``zorder_by`` instead clusters on a Morton curve over the given
        columns (``sinks.py::_zorder_key`` — the OPTIMIZE ... ZORDER
        analogue): every file gets a narrow footer range on EVERY listed
        column, so ``read_pruned`` skips files on any of them, not just
        the first. Mutually exclusive with ``order_by``."""
        if order_by and zorder_by:
            raise ValueError("pass either order_by or zorder_by, not both")
        cur = self.read()
        if zorder_by:
            from modular_etl_data_platform_spark.sources.sinks import _zorder_key

            key = _zorder_key(cur, zorder_by)
            merged = (
                cur.withColumn("__zkey", key)
                .repartitionByRange(target_files, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        elif order_by:
            cols = [F.col(c) for c in order_by]
            merged = cur.repartitionByRange(target_files, *cols).sortWithinPartitions(
                *cols
            )
        else:
            merged = cur.repartition(target_files)
        landed = self._land_files(merged)
        for _ in range(_MAX_COMMIT_RETRIES):
            try:
                return self._publish(
                    landed, cur.schema.json(), {"mode": "compact"},
                    expected_base=self.current_version() or 0,
                )
            except ConcurrentWriteError:
                # a racing APPEND added files this compaction never read;
                # blindly publishing would drop them — recompact from head
                return self.compact(target_files, order_by, zorder_by)
        raise ConcurrentWriteError(f"compact lost races on {self.path}")

    def compact_where(
        self,
        column: str,
        lo,
        hi,
        target_files: int = 1,
        order_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Incremental OPTIMIZE (Delta's ``OPTIMIZE ... WHERE``): rewrite
        ONLY the files whose recorded [min, max] for ``column``
        intersects [lo, hi]; every other file is carried into the new
        manifest untouched (files are immutable, so reuse is free).

        This is the 100 TB compaction story: a table that streams
        appends all day never rewrites its whole history — it compacts
        the hot key/time range the appends landed in, at a cost
        proportional to that range. Files with no recorded stats are
        conservatively treated as touched. Clustering options are those
        of :meth:`compact` and apply to the rewritten range only.
        Returns the new version — or the CURRENT version unchanged when
        there is nothing to do (no intersecting file, or a single
        intersecting file with no re-clustering requested; callers
        detect the no-op by comparing the returned version). With
        ``order_by``/``zorder_by`` set, even a single hot file is
        rewritten, so its internal layout can be re-clustered."""
        if order_by and zorder_by:
            raise ValueError("pass either order_by or zorder_by, not both")
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no versions in {self.path}")
        manifest = self._read_manifest(v)
        stats = manifest.get("stats", {})
        touched = [
            f
            for f in manifest["files"]
            if self._may_intersect(stats.get(f), column, lo, hi)
        ]
        if not touched or (len(touched) <= 1 and not (order_by or zorder_by)):
            return v
        untouched = [f for f in manifest["files"] if f not in set(touched)]
        part = self._read_files(touched, manifest["schema"])
        if zorder_by:
            from modular_etl_data_platform_spark.sources.sinks import _zorder_key

            key = _zorder_key(part, zorder_by)
            merged = (
                part.withColumn("__zkey", key)
                .repartitionByRange(target_files, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        elif order_by:
            cols = [F.col(c) for c in order_by]
            merged = part.repartitionByRange(target_files, *cols).sortWithinPartitions(
                *cols
            )
        else:
            merged = part.repartition(target_files)
        try:
            return self._publish(
                untouched + self._land_files(merged),
                manifest["schema"],
                {"mode": "compact_where", "column": column},
                prior=manifest,
                expected_base=v,
            )
        except ConcurrentWriteError:
            # rebase = re-select files against the new head (a racer may
            # have rewritten or added files in this range)
            return self.compact_where(column, lo, hi, target_files, order_by, zorder_by)

    def restore(self, version: int) -> int:
        """Make an old snapshot the new head (Delta ``RESTORE`` — an
        undo that PRESERVES history): publishes a NEW version pointing
        at the old version's files. O(1) — no data moves; the files are
        immutable and shared between the two manifests, which is also
        why the restored-from version must still be retained (vacuum
        keeps every file a retained manifest references)."""
        m = self._read_manifest(version)
        for _ in range(_MAX_COMMIT_RETRIES):
            try:
                return self._publish(
                    m["files"],
                    m["schema"],
                    {"mode": "restore", "restored_from": version},
                    prior=m,
                    expected_base=self.current_version() or 0,
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(f"restore lost races on {self.path}")

    # -- retention ------------------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` versions and delete data
        files no retained manifest references (this includes orphans from
        writes that crashed before publishing). Returns files deleted."""
        vs = self.versions()
        keep = set(vs[-keep_last:]) if keep_last > 0 else set()
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._read_manifest(v)["files"])
        deleted = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for sub in os.listdir(data_root):
            subdir = os.path.join(data_root, sub)
            for f in list(os.listdir(subdir)):
                fp = os.path.join(subdir, f)
                if f.endswith(".parquet") and fp not in referenced:
                    os.remove(fp)
                    deleted += 1
            if not any(p.endswith(".parquet") for p in os.listdir(subdir)):
                shutil.rmtree(subdir)
        for v in vs:
            if v not in keep:
                os.remove(self._manifest_path(v))
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        for n in os.listdir(mdir):  # tmp manifests from crashed claims
            if ".tmp" in n:
                os.remove(os.path.join(mdir, n))
        return deleted
