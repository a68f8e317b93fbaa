"""The 4-phase copy pipeline — ``CopyTool.doCopy`` re-expressed on Spark
(``CopyTool.java:168-314``; SURVEY.md §3.1).

Phases:

1. extract  — ``read_source`` (parquet/csv/jdbc; table, projected table, or
              arbitrary SQL evaluated natively) + schema normalization
              (lowercase/sanitize identifiers, autoTrim);
2. load     — write a new versioned Parquet physical table (the reference's
              staged-CSV + COPY INTO collapses into one distributed columnar
              write — no double materialization);
3. publish  — atomic view switch to the new version;
4. cleanup  — retention drop beyond 2 versions.

Cross-cutting semantics kept: watermark trigger skip (exit code 2), empty-
source guard aborting the whole run before any load, truncate/drop/create
flags, temp-table CTAS promotion, state persisted only after full success.

Exit codes: 0 = loaded, 1 = error, 2 = no new data
(``CopyTool.java:66-68,95-106``).
"""

from __future__ import annotations

import logging
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config.spec import CopyJob, JobSpec, spec_checksum
from ..schema.evolve import evolve_to_union
from ..schema.mapper import normalized_dataframe
from ..sources.readers import read_source, register_source_views
from .publish import VersionedCatalog
from .watermark import WatermarkStore, has_new_data, probe_max

log = logging.getLogger(__name__)

EXIT_OK = 0
EXIT_ERROR = 1
EXIT_NO_NEW_DATA = 2


class EmptyTablesError(RuntimeError):
    """A source produced 0 rows and allowEmpty is off — the whole run aborts
    before loading anything (``SourceDatabaseUtil.java:22-52``,
    ``EmptyTablesException.java:3-10``)."""


class NoNewDataError(RuntimeError):
    """Every configured trigger says the source is unchanged
    (``CopyTool.java:95-98`` -> exit code 2)."""


class CopyEngine:
    def __init__(self, spark: SparkSession, spec: JobSpec):
        self.spark = spark
        self.spec = spec
        self.catalog = VersionedCatalog(spec.warehouse_dir)
        self.store = WatermarkStore(spec.state_dir)
        self.checksum = spec_checksum(spec)
        # optional JDBC sink: publishes land in a real warehouse through the
        # reference's versioned-table + view-switch protocol (engine/export)
        self.warehouse = None
        if spec.sink is not None:
            from .export import JdbcWarehouse

            self.warehouse = JdbcWarehouse(spark, spec.sink)

    # -- trigger (PHASE 0, CopyTool.java:332-477) ------------------------
    def _probe_job(self, job: CopyJob):
        src = self.spec.sources[job.source]
        table = job.trigger_table or job.from_table
        if src.format == "jdbc" and table:
            # source-side MAX: the aggregate runs ON the database and one
            # row crosses the wire (the reference's dialect probe) — the
            # Spark-side agg would pull the whole trigger column, since
            # the V1 JDBC relation never pushes aggregates
            from .watermark import probe_max_jdbc

            try:
                wm = probe_max_jdbc(self.spark, src, table, job.trigger_column)
                self.store.save_degradations(self.checksum, job.job_id, 0)
                return wm
            except Exception:
                # both identifier casings failed (probe_max_jdbc's quoted ->
                # unquoted ladder) — degrade to the Spark-side probe instead
                # of losing the no-new-data skip to the fail-open rule. The
                # Spark-side probe pulls the whole trigger column across the
                # wire, so REPEATED degradation (same job, consecutive runs)
                # escalates to ERROR: at a 100 TB source that is a standing
                # scale regression, not a transient. The counter persists in
                # the WatermarkStore so the escalation survives the normal
                # run-per-invocation deployment (ADVICE r10).
                n = self.store.load_degradations(self.checksum, job.job_id) + 1
                self.store.save_degradations(self.checksum, job.job_id, n)
                msg = (
                    "source-side MAX probe failed for %s — degrading to the "
                    "Spark-side full-column probe (run %d)"
                )
                if n >= 2:
                    log.error(
                        msg + "; this is persistent — the pushdown's "
                        "one-row-across-the-wire property is LOST every run; "
                        "fix the trigger column's identifier case",
                        job.job_id,
                        n,
                        exc_info=True,
                    )
                else:
                    log.warning(msg, job.job_id, n, exc_info=True)
        trigger_job = CopyJob(
            job_id=f"{job.job_id}__trigger",
            source=job.source,
            from_table=table,
        )
        df = read_source(self.spark, src, trigger_job)
        return probe_max(df, job.trigger_column)

    def check_for_new_data(self) -> dict[str, object]:
        """Return {job_id: probe} for triggered jobs; raise NoNewDataError
        when every triggered job is unchanged (and at least one exists)."""
        probes: dict[str, object] = {}
        triggered = [j for j in self.spec.jobs.values() if j.trigger_column]
        if not triggered:
            return probes
        fresh = False
        for job in triggered:
            state = self.store.load(self.checksum, job.job_id)
            try:
                probe = self._probe_job(job)
            except Exception:
                log.warning("trigger probe failed for %s — failing open", job.job_id, exc_info=True)
                probe = None
                fresh = True  # probe error => run (CopyTool.java:375-381)
            probes[job.job_id] = probe
            if has_new_data(probe, state):
                fresh = True
        if not fresh:
            raise NoNewDataError("no new data in any triggered source")
        return probes

    # -- empty guard (CopyTool.java:192-197) -----------------------------
    def _extract(self, job: CopyJob) -> DataFrame:
        src = self.spec.sources[job.source]
        df = read_source(self.spark, src, job)
        return normalized_dataframe(df, auto_trim=job.auto_trim)

    def _zorder_cluster(self, df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
        """Morton-cluster the load on ``cols`` (numeric) before writing.

        Bounds come from one MIN/MAX probe over the extracted frame — the
        same cheap probe shape as the watermark trigger; file count follows
        the upstream partitioning.
        """
        from pyspark.sql import functions as F

        from .zorder import ZCol, cluster_by_zorder

        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"hi_{c}")]
        stats = df.agg(*aggs).collect()[0]
        specs = []
        for c in cols:
            lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
            if lo is None or hi is None:
                raise ValueError(f"zorder_by column {c!r} is non-numeric or all-NULL")
            specs.append(ZCol(c, lo, hi))
        num_files = max(1, df.rdd.getNumPartitions())
        return cluster_by_zorder(df, specs, num_files=num_files)

    def count_source(self, job: CopyJob, df: DataFrame) -> int:
        """Pre-scan count (op #4, ``CopyTool.java:643-649``): the declared
        ``count_query`` (evaluated natively — reference ships it to the
        source DB, ``CopyTable.java:300-308``) when present, else df.count().

        The job's own source views are re-registered immediately before the
        SQL runs: bare temp views are session-global, so another query-mode
        job (or a published view of the same name) could otherwise shadow
        the relation the count targets.
        """
        if job.count_query:
            register_source_views(self.spark, self.spec.sources[job.source])
            row = self.spark.sql(job.count_query).collect()[0]
            return int(row[0])
        return df.count()

    def assert_non_empty(self, frames: dict[str, DataFrame]) -> dict[str, int]:
        """Pre-load count of every source; abort the whole run on any empty
        source unless that job allows it. The count doubles as the
        progress/validation count."""
        counts: dict[str, int] = {}
        empty: list[str] = []
        for job_id, df in frames.items():
            job = self.spec.jobs[job_id]
            n = self.count_source(job, df)
            counts[job_id] = n
            if n == 0 and not job.allow_empty:
                empty.append(job_id)
        if empty:
            raise EmptyTablesError(f"sources returned 0 rows: {', '.join(sorted(empty))}")
        return counts

    # -- the 4 phases ----------------------------------------------------
    def do_copy(
        self,
        *,
        no_switch: bool = False,
        switch_only: bool = False,
        load_date: datetime | None = None,
    ) -> dict[str, str]:
        """Run the pipeline; returns {job_id: physical_name}.

        ``no_switch`` stops after phase 2 (load but don't publish);
        ``switch_only`` publishes the newest already-loaded version without
        extracting (the reference's CLI modes, ``CopyToolConfig.java:116-279``).
        """
        load_date = load_date or datetime.now(timezone.utc).replace(tzinfo=None)
        published: dict[str, str] = {}

        if self.warehouse is not None:
            return self._do_copy_jdbc_sink(
                no_switch=no_switch, switch_only=switch_only, load_date=load_date
            )

        if switch_only:
            for job in self.spec.jobs.values():
                physical = self.catalog.newest_version(job.schema_name, job.to_table)
                if physical is None:
                    raise FileNotFoundError(
                        f"switch-only: no loaded version for {job.schema_name}.{job.to_table}"
                    )
                self.catalog.publish(self.spark, job.schema_name, job.to_table, physical)
                self.catalog.cleanup(job.schema_name, job.to_table)
                published[job.job_id] = physical
            return published

        probes = self.check_for_new_data()

        # PHASE 1: extract all (plans built lazily; counts force the scans)
        frames = {job_id: self._extract(job) for job_id, job in self.spec.jobs.items()}
        self.assert_non_empty(frames)

        # PHASE 2: load all (each job writes a new version; drop/truncate
        # flags mirror reference ops #12/#15)
        loaded: dict[str, str] = {}
        for job_id, df in frames.items():
            job = self.spec.jobs[job_id]
            if job.drop:
                self.catalog.drop_table(self.spark, job.schema_name, job.to_table)
            if not job.create and not self.catalog.exists(job.schema_name, job.to_table):
                raise FileNotFoundError(
                    f"target {job.schema_name}.{job.to_table} does not exist and create=False"
                )
            if job.truncate:
                # versioned publish makes truncate implicit (the new version
                # fully replaces); kept as an explicit empty-write for
                # non-versioned parity when fast view switching is off
                pass
            # incremental append (trigger-filtered delta + published snapshot):
            # only rows strictly newer than the persisted watermark are read
            # from the source — the filter pushes down to the source scan —
            # and the new version is snapshot+delta (the reference re-copies
            # the full table every run; this is the Spark-first upgrade)
            reads_current = False
            if job.incremental:
                state = self.store.load(self.checksum, job.job_id)
                cur = self.catalog.current_version(job.schema_name, job.to_table)
                if state is not None and cur is not None:
                    delta = df.filter(F.col(job.trigger_column) > F.lit(state.value))
                    snapshot = self.spark.read.parquet(
                        self.catalog.version_dir(job.schema_name, cur)
                    )
                    df = snapshot.unionByName(delta, allowMissingColumns=True)
                    reads_current = True

            # schema verify + evolve (op #14): widen the new version to the
            # union of the published schema and the incoming one so the view
            # never loses columns; incompatible retyping fails loudly
            current = self.catalog.current_version(job.schema_name, job.to_table)
            if current is not None:
                published_schema = self.spark.read.parquet(
                    self.catalog.version_dir(job.schema_name, current)
                ).schema
                df = evolve_to_union(df, published_schema)
            if job.zorder_by:
                df = self._zorder_cluster(df, job.zorder_by)
            target = job.to_table if job.use_fast_view_switching else f"tmp_{job.to_table}"
            # Same-load_date reruns OVERWRITE their version (crash-retry
            # idempotence, pinned by test_same_load_date_is_idempotent) —
            # EXCEPT when this run's plan lazily reads the current
            # version's directory (incremental snapshot+delta): the date
            # has 1-second granularity, so a tick in the same second as
            # the previous publish would overwrite the directory it is
            # reading mid-write, and a THIRD same-second tick would land
            # back on the first name — destroying the retained backup and
            # publishing a name that sorts below a retained newer one
            # (newest_version/switch_only would then serve stale data).
            # So in incremental mode, bump past the PUBLISHED lineage
            # (manifest ``physical`` + ``previous`` — the versions the
            # incremental read and the keep-2 rollback window actually
            # protect). A retained dir that collides but was NEVER
            # published is a half-written leftover from a crashed attempt:
            # bumping past it would let retention count the corpse as the
            # "backup" and reap the last good version, so instead the name
            # is RECLAIMED — write_version's mode("overwrite") replaces the
            # corpse (the manifest-driven same-name replay the streaming
            # sync uses).
            # The collision is computed on the PUBLIC name: in temp-table
            # mode the written dir is tmp_-prefixed but the PHASE 3
            # os.replace promotion lands on the public name, which is
            # where the collision actually bites.
            from datetime import timedelta

            from .publish import physical_name

            eff_date = load_date
            if reads_current:
                retained = set(
                    self.catalog.table_versions(job.schema_name, job.to_table)
                )
                info = self.catalog.manifest_info(job.schema_name, job.to_table)
                protected = {info.get("physical"), info.get("previous")} - {None}
                while True:
                    name = physical_name(job.to_table, eff_date)
                    if name not in retained or name not in protected:
                        break  # free, or an unpublished corpse to reclaim
                    eff_date += timedelta(seconds=1)
            physical = self.catalog.write_version(
                df, job.schema_name, target, eff_date,
                sort_by=list(job.sort_by) if job.sort_by else None,
                partition_by=list(job.partition_by) if job.partition_by else None,
            )
            loaded[job_id] = physical

        if no_switch:
            return loaded

        # PHASE 3: publish (view switch / CTAS-promote for temp mode)
        for job_id, physical in loaded.items():
            job = self.spec.jobs[job_id]
            if not job.use_fast_view_switching:
                # CTAS promotion analog (op #17, CopyTool.java:1107-1124):
                # re-publish the temp physical dir under the public name.
                # A same-load_date retry overwrites its previous promotion
                # (os.replace cannot rename onto a non-empty directory) —
                # the same idempotent-retry contract as fast-mode
                # write_version's mode("overwrite").
                import os
                import shutil

                src_dir = self.catalog.version_dir(job.schema_name, physical)
                promoted = physical.replace("tmp_", "", 1)
                dst_dir = self.catalog.version_dir(job.schema_name, promoted)
                if os.path.exists(dst_dir):
                    shutil.rmtree(dst_dir)
                os.replace(src_dir, dst_dir)
                physical = promoted
            self.catalog.publish(self.spark, job.schema_name, job.to_table, physical)
            published[job_id] = physical

        # PHASE 4: retention cleanup
        for job_id in published:
            job = self.spec.jobs[job_id]
            self.catalog.cleanup(job.schema_name, job.to_table)

        # persist trigger state ONLY after full success (CopyTool.java:305-309)
        for job_id, probe in probes.items():
            if probe is not None:
                self.store.save(self.checksum, probe, job_id)
        return published

    @staticmethod
    def _sink_schema(job) -> str | None:
        """Warehouse schema for a job: ``None`` (the connection's default
        schema, unqualified SQL) for the config's ``default`` namespace."""
        return None if job.schema_name == "default" else job.schema_name

    def _do_copy_jdbc_sink(
        self, *, no_switch: bool, switch_only: bool, load_date: datetime
    ) -> dict[str, str]:
        """The 4 phases against a real JDBC warehouse (the reference's
        MonetDB topology): extract is unchanged; load lands each job in a
        new versioned physical table (staged bulk COPY or batched INSERT);
        publish is the transactional view switch; cleanup is keep-2
        retention on the server. Trigger probes, the all-or-nothing empty
        guard, exit codes, and state-after-success are IDENTICAL to the
        parquet path — only the storage side of phases 2-4 differs.

        The pre-load counts from the empty guard double as the bulk
        loader's verification counts (the reference's count file,
        ``CopyTool.java:643-649``), so no extra count job runs.
        """
        wh = self.warehouse
        published: dict[str, str] = {}

        # map the config's "default" namespace to the connection's default
        # schema (unqualified SQL, the pre-round-10 behavior); any other
        # schema name qualifies every statement and scopes every catalog
        # probe (reference MonetDBTable.java:12-25)

        if switch_only:
            for job in self.spec.jobs.values():
                schema = self._sink_schema(job)
                versions = wh.table_versions(job.to_table, schema=schema)
                if not versions:
                    raise FileNotFoundError(
                        f"switch-only: no loaded version for {job.to_table}"
                    )
                wh.publish(job.to_table, versions[0], schema=schema)
                wh.cleanup(job.to_table, schema=schema)
                # report in the engine's canonical lowercase (store listings
                # come back store-cased; unquoted SQL resolves either way)
                published[job.job_id] = versions[0].lower()
            return published

        probes = self.check_for_new_data()

        frames = {job_id: self._extract(job) for job_id, job in self.spec.jobs.items()}
        counts = self.assert_non_empty(frames)

        loaded: dict[str, str] = {}
        for job_id, df in frames.items():
            job = self.spec.jobs[job_id]
            schema = self._sink_schema(job)
            if job.drop:
                wh.drop_table(job.to_table, schema=schema)
            if not job.create and not wh.exists(job.to_table, schema=schema):
                raise FileNotFoundError(
                    f"target {job.to_table} does not exist and create=False"
                )
            if job.sort_by:
                df = df.sortWithinPartitions(*job.sort_by)
            loaded[job_id] = wh.load_version(
                df,
                job.to_table,
                load_date,
                method=self.spec.sink_method,
                staging_dir=self.spec.sink_staging_dir,
                expected_count=counts[job_id],
                schema=schema,
                import_concurrency=self.spec.sink_import_concurrency,
            )

        if no_switch:
            return loaded

        for job_id, physical in loaded.items():
            job = self.spec.jobs[job_id]
            wh.publish(job.to_table, physical, schema=self._sink_schema(job))
            published[job_id] = physical
        for job_id in published:
            job = self.spec.jobs[job_id]
            wh.cleanup(job.to_table, schema=self._sink_schema(job))

        for job_id, probe in probes.items():
            if probe is not None:
                self.store.save(self.checksum, probe, job_id)
        return published

    def run(self, *, notify=None, **kwargs) -> int:
        """CLI-shaped wrapper with the reference's exit codes.

        ``notify`` is the failure-notification hook (the reference mails a
        stack trace on any job error, ``EmailUtil.java:21-111``): called
        with the exception; its own failures are swallowed.
        """
        try:
            self.do_copy(**kwargs)
            return EXIT_OK
        except NoNewDataError:
            log.info("no new data — skipping run (exit 2)")
            return EXIT_NO_NEW_DATA
        except Exception as exc:
            log.exception("copy run failed")
            if notify is not None:
                try:
                    notify(exc)
                except Exception:
                    log.exception("failure-notification hook raised")
            return EXIT_ERROR

    # -- convenience -----------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Query the published views (the post-publish read path)."""
        return self.spark.sql(query)

    def table(self, table: str, schema: str = "default") -> DataFrame:
        if self.warehouse is not None:
            # jdbc sink: the published name is a VIEW on the warehouse
            # (schema-qualified when the job declared a non-default schema)
            from ..sources.readers import read_source

            name = table if schema == "default" else f"{schema}.{table}"
            return read_source(
                self.spark,
                self.spec.sink,
                CopyJob(job_id=f"read_{table}", source="_sink", from_table=name),
            )
        self.catalog.register_view(self.spark, schema, table)
        name = table if schema == "default" else f"{schema}_{table}"
        return self.spark.table(name)
