"""Medallion pipeline orchestration — the reference's three entry points
(SURVEY §3 EP1-EP3) as engine verbs:

- :meth:`MedallionPipeline.ingest_bronze` (C1): schema-first read → audit
  columns → partitioned append (reference: config/bronze/schema/README.md:62-87).
- :meth:`MedallionPipeline.transform_silver` (C2): incremental read →
  expression transforms → validate/quarantine → dedup keep-latest →
  keyed upsert (reference: config/silver/schema/README.md:160-191).
- :meth:`MedallionPipeline.build_dimension` / :meth:`load_fact` (C4/C5):
  SCD2 merge + fact builds (reference: config/gold/schema/README.md:300-341).

All steps are lazy DataFrame plans until the sink action; Catalyst fuses
transform + validate + dedup into the minimal number of stages
(scan-projection → PK-shuffle window → write).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.dedup import dedupe_latest
from modular_etl_data_platform_spark.operators.scd2 import apply_scd_type2
from modular_etl_data_platform_spark.operators.transforms import (
    apply_transformations,
    conform_to_schema,
)
from modular_etl_data_platform_spark.operators.upsert import upsert_parquet
from modular_etl_data_platform_spark.operators.validate import RuleSet
from modular_etl_data_platform_spark.operators.watermark import (
    WatermarkStore,
    advance_watermark,
    incremental_filter,
)
from modular_etl_data_platform_spark.schema.registry import TableConfig
from modular_etl_data_platform_spark.sources.audit import add_metadata_columns
from modular_etl_data_platform_spark.sources.readers import CORRUPT_COL, read_source
from modular_etl_data_platform_spark.sources.sinks import (
    append_partitioned,
    write_quarantine,
)


@dataclass
class MedallionPipeline:
    """``storage`` selects the physical layer contract:

    - ``"parquet"`` (default): plain parquet dirs, MERGE via
      ``upsert_parquet`` (staging + atomic swap).
    - ``"versioned"``: every layer table is a ``VersionedTable``
      (manifest commit log — the reference's layers ARE Delta tables,
      reference: config/bronze/schema/README.md:83-87): snapshot
      isolation, time travel across reruns, file-pruned MERGE, RESTORE.
      The shared append-only DQ error tables (``bronze_dq_errors`` /
      ``silver_dq_errors``) stay plain parquet in both modes — they are
      write-once logs with no MERGE/time-travel contract.

    Reads dispatch on what is actually on disk (a manifest log ⇒
    versioned), so a warehouse can be read back regardless of which
    mode built it."""

    spark: SparkSession
    warehouse: str  # root dir for layer tables
    raw_base: str | None = None  # base dir for raw source files
    storage: str = "parquet"  # "parquet" | "versioned"
    #: versioned mode only: route keyed MERGEs through deletion vectors
    #: (no data-file rewrites; see VersionedTable.upsert — worth it for
    #: wide tables with small scattered batches, a loss on toy tables)
    use_deletion_vectors: bool = False
    _watermarks: WatermarkStore = field(init=False)

    def __post_init__(self):
        if self.storage not in ("parquet", "versioned"):
            raise ValueError(f"storage must be parquet|versioned, got {self.storage!r}")
        os.makedirs(self.warehouse, exist_ok=True)
        self._watermarks = WatermarkStore(os.path.join(self.warehouse, "_watermarks.json"))

    # -- paths ---------------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _vt(self, name: str, stats_columns: list[str] | None = None):
        from modular_etl_data_platform_spark.operators.versioned import (
            VersionedTable,
        )

        return VersionedTable(
            self.spark, self.table_path(name), stats_columns=stats_columns or []
        )

    def table_exists(self, name: str) -> bool:
        from modular_etl_data_platform_spark.operators.versioned import (
            is_versioned_table,
        )

        p = self.table_path(name)
        return is_versioned_table(p) or os.path.exists(p)

    def read_table(
        self, name: str, version: int | None = None, timestamp=None
    ) -> DataFrame:
        """Read a layer table; versioned tables resolve through their
        commit log (pass ``version`` — or ``timestamp`` for Delta's
        TIMESTAMP AS OF — for time travel), parquet tables read the
        directory. Time travel on a non-versioned table is an error
        rather than a silent ignore."""
        from modular_etl_data_platform_spark.operators.versioned import (
            is_versioned_table,
        )

        p = self.table_path(name)
        if is_versioned_table(p):
            return self._vt(name).read(version, timestamp=timestamp)
        if version is not None or timestamp is not None:
            raise ValueError(
                f"{name} is not a versioned table; cannot time-travel"
            )
        return self.spark.read.parquet(p)

    def _read_source_for_increment(
        self, source_table: str, inc_col: str | None, wm
    ) -> DataFrame:
        """The incremental-read scan of a source layer table: a
        file-pruned snapshot when the source is versioned and a
        watermark exists (conservative file selection — the exact
        ``col > wm`` predicate is applied by ``incremental_filter`` on
        top), otherwise the plain table read (parquet mode already
        prunes via hive partitions + pushed filters)."""
        from modular_etl_data_platform_spark.operators.versioned import (
            is_versioned_table,
        )

        p = self.table_path(source_table)
        if inc_col and wm is not None and is_versioned_table(p):
            return self._vt(source_table).read_pruned(
                inc_col, lo=wm, hi=None, residual=False, lo_inclusive=False
            )
        return self.read_table(source_table)

    @staticmethod
    def _stats_cols(config: TableConfig) -> list[str]:
        """Columns worth per-file min/max stats in versioned mode: the
        primary keys (file-pruned MERGE), the incremental column (a
        downstream watermark read prunes to the new batch's files — the
        role hive partitioning by ``partition_by`` plays in parquet
        mode), and the partition columns themselves (point reads on the
        layout key skip files). Numeric/timestamp/date/string columns
        record; others stay conservative (never pruned, never
        mis-pruned)."""
        cols = list(config.primary_keys)
        inc = config.incremental_column
        if inc and inc not in cols:
            cols.append(inc)
        for c in config.partition_by:
            if c not in cols:
                cols.append(c)
        return cols

    # -- storage-dispatch sinks ----------------------------------------------
    def upsert_table(
        self,
        df: DataFrame,
        name: str,
        primary_keys: list[str],
        partition_by: list[str] | None = None,
        stats_columns: list[str] | None = None,
    ) -> None:
        """Keyed MERGE through the configured storage. Versioned mode
        records footer stats on ``stats_columns`` (default: the primary
        keys) so narrow-key upserts take the file-pruned path
        (numeric/timestamp keys; others stay on the conservative full
        merge)."""
        if self.storage == "versioned":
            self._vt(name, stats_columns=stats_columns or primary_keys).upsert(
                df, primary_keys,
                use_deletion_vectors=self.use_deletion_vectors,
            )
        else:
            upsert_parquet(
                self.spark, df, self.table_path(name), primary_keys, partition_by
            )

    def write_table(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        stats_columns: list[str] | None = None,
    ) -> None:
        """Full-refresh write through the configured storage (gold fact
        rebuilds, generated dims). Versioned mode publishes a new
        overwrite version — prior fact states stay time-travelable —
        and records footer stats on the layout columns (default: the
        partition columns), so the range/point reads hive partitioning
        would have served go through ``read_pruned`` instead."""
        if self.storage == "versioned":
            self._vt(
                name, stats_columns=stats_columns or partition_by or []
            ).write(df, mode="overwrite")
        else:
            from modular_etl_data_platform_spark.sources.sinks import overwrite_table

            overwrite_table(df, self.table_path(name), partition_by)

    # -- EP1: bronze (C1) ------------------------------------------------------
    def ingest_bronze(self, config: TableConfig, path_override: str | None = None) -> DataFrame:
        """Schema-first read → audit columns → partitioned append.

        File-level exactly-once: files whose lineage (``source_file``
        audit column) is already in the bronze table are skipped, so
        re-running the pipeline never double-ingests. The seen-file set
        is a single-column scan of the target — distinct file paths, not
        rows — and joins back as a broadcast anti-join.

        Malformed rows (PERMISSIVE parse failures) are split off to the
        shared ``bronze_dq_errors`` table with their raw record text —
        never silently nulled into the clean table. The cache before the
        split keeps Spark's corrupt-column restriction satisfied and
        reads the source once.
        """
        raw = read_source(
            self.spark,
            config,
            base_path=self.raw_base,
            path_override=path_override,
            capture_corrupt=True,
        )
        # audit columns BEFORE any cache: input_file_name() only resolves
        # while rows still carry scan context
        bronze = add_metadata_columns(raw, config.raw.get("source_system", "unknown"))
        if CORRUPT_COL in bronze.columns:
            # localCheckpoint, not cache(): it reads the source once,
            # severs the raw-scan lineage (so the corrupt-column-only
            # query restriction can't trip downstream), and its blocks are
            # released when the frame is garbage-collected — a cache()
            # would sit in the CacheManager until unpersist/session end,
            # accumulating across a multi-table pipeline run
            bronze = bronze.localCheckpoint(eager=True)
            corrupt = bronze.filter(F.col(CORRUPT_COL).isNotNull())
            if corrupt.limit(1).count():
                write_quarantine(
                    corrupt,
                    self.table_path("bronze_dq_errors"),
                    config.table_name,
                    "malformed_record",
                    CORRUPT_COL,
                )
            bronze = bronze.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        target = self.table_path(config.table_name)
        if self.table_exists(config.table_name):
            seen = (
                self.read_table(config.table_name)
                .select("source_file")
                .dropDuplicates()
            )
            bronze = bronze.join(F.broadcast(seen), "source_file", "left_anti")
        if self.storage == "versioned":
            # stats on the incremental/partition columns give the
            # versioned bronze table the pruning its parquet-mode hive
            # layout would provide: a silver watermark read opens only
            # the new batch's files (read_pruned), not the table. The
            # stamped audit timestamps are always included — they are
            # the default incremental handle downstream configs name.
            stats = self._stats_cols(config)
            for c in ("ingestion_timestamp", "ingestion_date"):
                if c not in stats:
                    stats.append(c)
            vt = self._vt(config.table_name, stats_columns=stats)
            mode = "append" if vt.current_version() is not None else "overwrite"
            vt.write(bronze, mode=mode)
        else:
            append_partitioned(bronze, target, config.partition_by or None)
        return bronze

    # -- EP2: silver (C2) -------------------------------------------------------
    def transform_silver(
        self, config: TableConfig, order_col: str = "ingestion_timestamp"
    ) -> dict[str, int]:
        """5-stage silver load; returns row-count metrics per stage."""
        # 1. incremental filter (P3) against stored watermark. On a
        # VERSIONED source the watermark also prunes at the FILE level:
        # only files whose recorded [min, max] on the incremental column
        # can contain rows past the mark are opened (read_pruned with
        # the exact strictly-greater predicate applied on top) — the
        # versioned-mode analogue of hive-partition pruning, so an
        # incremental pass over a year of bronze opens one batch's
        # files, not the table.
        inc_col = config.incremental_column
        wm = self._watermarks.get(config.table_name) if inc_col else None
        src = self._read_source_for_increment(config.source_table, inc_col, wm)
        batch = incremental_filter(src, inc_col, wm) if inc_col else src

        # 2. expression transforms (P2/T1-T7) + schema conformance (P1)
        transformed = apply_transformations(batch, config.transformations())
        conformed = conform_to_schema(transformed, config, extra_cols=[order_col])

        # 3. validate (C3) with quarantine (S10)
        rules = RuleSet.from_config(config.data_quality_rules)
        valid, quarantined = rules.split(conformed)

        # 3b. referential integrity (J5): quarantine child rows whose FK
        # has no parent in the already-loaded silver reference table
        # (parents load first per the layer ordering contract)
        for fk, ref in rules.referential.items():
            if not self.table_exists(ref["reference_table"]):
                continue
            parent = self.read_table(ref["reference_table"])
            from modular_etl_data_platform_spark.operators.joins import (
                ri_orphans,
                ri_valid,
            )

            orphans = ri_orphans(valid, parent, fk=fk, pk=ref["reference_column"])
            quarantined = quarantined.unionByName(
                orphans.withColumn(
                    "failed_rules", F.array(F.lit(f"referential_integrity:{fk}"))
                ),
                allowMissingColumns=False,
            )
            valid = ri_valid(valid, parent, fk=fk, pk=ref["reference_column"])

        # metrics ride the write actions via Observation — a separate
        # .count() would re-execute the whole transform+validate plan
        # (a full second pass over the batch at scale). The error record
        # is normalized to the reference contract (table, rules, payload,
        # timestamp — reference: config/silver/schema/README.md:296-303)
        # so every silver table appends the SAME schema to the shared
        # error table.
        obs_bad = Observation()
        err = quarantined.select(
            F.lit(config.table_name).alias("table_name"),
            F.to_json(F.col("failed_rules")).alias("failed_rules"),
            F.to_json(
                F.struct(*[c for c in quarantined.columns if c != "failed_rules"])
            ).alias("row_payload"),
            F.current_timestamp().alias("error_timestamp"),
        ).observe(obs_bad, F.count(F.lit(1)).alias("rows"))
        err.write.mode("append").parquet(self.table_path("silver_dq_errors"))
        n_bad = obs_bad.get["rows"]

        # 4. dedup keep-latest per PK (W1)
        deduped = dedupe_latest(valid, config.primary_keys, order_col)

        # 5. keyed upsert (S8)
        final = deduped.drop(order_col) if order_col not in config.column_names() else deduped
        obs_out = Observation()
        final = final.observe(obs_out, F.count(F.lit(1)).alias("rows"))
        self.upsert_table(
            final,
            config.table_name,
            config.primary_keys,
            config.partition_by or None,
            stats_columns=self._stats_cols(config),
        )
        if inc_col:
            new_wm = advance_watermark(batch, inc_col)
            if new_wm is not None:
                self._watermarks.set(config.table_name, new_wm)
        n_out = obs_out.get["rows"]
        return {"quarantined": n_bad, "upserted": n_out}

    # -- EP3: gold (C4/C5) -------------------------------------------------------
    def build_dimension(self, config: TableConfig, batch: DataFrame) -> DataFrame:
        scd = config.scd_config
        current = (
            self.read_table(config.table_name)
            if self.table_exists(config.table_name)
            else None
        )
        dim = apply_scd_type2(
            current,
            batch,
            keys=config.primary_keys,
            type2_cols=scd.get("type2_columns", []),
            type1_cols=scd.get("type1_columns", []),
            hash_delimiter=scd.get("hash_delimiter", "|"),
            # reference dims name their surrogate per table
            # (customer_key / product_key — reference:
            # config/gold/schema/gold_dim_customer_schema.json:11-15)
            surrogate_key_col=config.surrogate_key or "surrogate_key",
        )
        self.upsert_table(dim, config.table_name, config.primary_keys + ["valid_from"])
        return self.read_table(config.table_name)

    # -- statistics / CBO hook -------------------------------------------------
    def analyze_table(
        self, name: str, columns: list[str] | None = None
    ) -> dict[str, str]:
        """Compute table (and optionally column) statistics for the
        cost-based optimizer — the reference's post-load
        ``ANALYZE TABLE gold.<t> COMPUTE STATISTICS [FOR COLUMNS pks]``
        step (reference: config/gold/schema/README.md:391).

        A path-based warehouse table is first registered in the session
        catalog as an external parquet table (no data movement — the
        catalog entry points at the existing directory); catalog-managed
        names are analyzed as-is. Returns the catalog's recorded
        statistics line(s) from ``DESCRIBE EXTENDED`` so callers (and
        tests) can confirm the CBO actually sees them.

        At scale this is what turns join-reorder and broadcast decisions
        from byte-size heuristics into cardinality-based ones — run it
        after each gold load, on at least the PK/join columns.

        VERSIONED tables cannot be registered as a parquet LOCATION (the
        directory holds every retained snapshot's files — the catalog
        would scan superseded versions). Their snapshot reads already
        give Spark an exact per-snapshot sizeInBytes (the plan lists the
        manifest's files), so this method computes the same statistics
        directly over the current snapshot — one aggregate pass — and
        returns them in the identical shape.
        """
        from modular_etl_data_platform_spark.operators.versioned import (
            is_versioned_table,
        )

        spark = self.spark
        if is_versioned_table(self.table_path(name)):
            vt = self._vt(name)
            snap = vt.read()
            manifest = vt._read_manifest(vt.current_version())
            logged = manifest.get("sizes", {})
            nbytes = sum(
                logged.get(f) or os.path.getsize(f) for f in manifest["files"]
            )
            aggs = [F.count(F.lit(1)).alias("__n")]
            for c in columns or []:
                aggs += [
                    F.countDistinct(F.col(c)).alias(f"__d_{c}"),
                    F.sum(F.col(c).isNull().cast("long")).alias(f"__z_{c}"),
                    F.min(F.col(c)).cast("string").alias(f"__lo_{c}"),
                    F.max(F.col(c)).cast("string").alias(f"__hi_{c}"),
                ]
            row = snap.agg(*aggs).first()
            stats = {"Statistics": f"{nbytes} bytes, {row['__n']} rows"}
            for c in columns or []:
                stats[f"col:{c}"] = (
                    f"distinct_count={row[f'__d_{c}']}; "
                    f"num_nulls={row[f'__z_{c}']}; "
                    f"min={row[f'__lo_{c}']}; max={row[f'__hi_{c}']}"
                )
            return stats
        if not spark.catalog.tableExists(name):
            path = self.table_path(name)
            if not os.path.exists(path):
                raise FileNotFoundError(f"no warehouse table or catalog entry: {name}")
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS `{name}` USING PARQUET LOCATION '{path}'"
            )
        spark.sql(f"ANALYZE TABLE `{name}` COMPUTE STATISTICS")
        if columns:
            cols = ", ".join(f"`{c}`" for c in columns)
            spark.sql(f"ANALYZE TABLE `{name}` COMPUTE STATISTICS FOR COLUMNS {cols}")
        stats = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE EXTENDED `{name}`").collect()
            if r.col_name == "Statistics"
        }
        for c in columns or []:
            desc = spark.sql(f"DESCRIBE EXTENDED `{name}` `{c}`").collect()
            stats[f"col:{c}"] = "; ".join(
                f"{r.info_name}={r.info_value}"
                for r in desc
                if r.info_name in ("distinct_count", "num_nulls", "min", "max")
            )
        return stats
