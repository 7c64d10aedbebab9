"""The crawl engine: frontier → politeness → fetch → normalize → dedup → merge.

Spark re-expression of the reference daemon loop
(/root/reference/src/spider.rs:36-223). One micro-batch = "page k for every
active host": the reference crawls each host's pages strictly sequentially
(page 1, 2, … until an empty page, src/spider.rs:65-122) and hosts
sequentially in seed order; since no data flows *between* hosts, per-host
sequential order with cross-host parallelism yields the identical per-host
visit sequence and the identical final state. The deterministic global visit
order the engine reports (``crawl_order``) is the pure-function sort
(forge_id, page, idx_in_page) — the reference's own effective order.

Batch dataflow (SURVEY.md §3.1):

    active_state ⋉ consent [P4/P5, broadcast]
      → page-URL construction (JVM concat)
      → politeness slot assignment per host [P1/P2] → defer over-budget pages
      → "fetch" = co-partitioned join against the documents table [S3]
      → from_json parse + normalize [N1-N3] ; topics join [S4/J4]
      → keep-first user dedup in crawl order [D5] ; array_distinct tags [D6]
      → bloom-prefiltered anti-join vs url_seen [D1-D4]
      → MERGE (insert-if-absent) into users / repositories / forges [S5-S7]
      → url_seen append ; visit-log append ; lineage counters append [A3]
      → state snapshot commit (the checkpoint; resume = reopen tables)

Scale: every table is keyed/bucketed by host_bucket = bucket(B, hostname);
the fetch join and the seen anti-join are co-partitioned on it. Mega-host
skew in the heavy stages is spread by scaled salting (operators/skew.py) and
AQE skew-join. The documents "fetch" join stands in for the HTTP fetch; on a
real crawl it becomes an ``applyInPandas`` per host bucket doing batched
HTTP, same partitioning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from starchart_spark import tables
from starchart_spark.functions.urls import canonicalize_udf, host_bucket, url_hash
from starchart_spark.operators import bloom as bloom_mod
from starchart_spark.operators import dedup, normalize, politeness
from starchart_spark.snapstore import SnapshotTable

STATE = T.StructType(
    [
        T.StructField("forge_id", T.LongType(), False),
        T.StructField("hostname", T.StringType(), False),  # bare host
        T.StructField("forge_url", T.StringType(), False),  # canonical, clean_url'd
        T.StructField("forge_type", T.StringType(), False),
        T.StructField("next_page", T.IntegerType(), False),
        T.StructField("active", T.BooleanType(), False),
        T.StructField("effective_rate_ms", T.LongType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
    ]
)

VISIT_LOG = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("forge_id", T.LongType(), False),
        T.StructField("hostname", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("idx_in_page", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), False),
    ]
)


@dataclass
class CrawlSettings:
    items_per_api_call: int = 20  # config/default.toml:36
    rate_ms: int = politeness.DEFAULT_RATE_MS
    budget_ms: int | None = None  # politeness budget per host per batch
    host_buckets: int = 32
    use_bloom: bool = True
    max_batches: int = 10_000
    snapshot_keep: int = 50


class CrawlEngine:
    def __init__(self, spark: SparkSession, warehouse: str, settings: CrawlSettings | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.s = settings or CrawlSettings()
        os.makedirs(warehouse, exist_ok=True)
        t = lambda name, schema, keys: SnapshotTable(  # noqa: E731
            os.path.join(warehouse, name), schema, keys
        )
        self.forges = t("forges", tables.FORGES, ["hostname"])
        self.users = t("users", tables.USERS, ["hostname", "username"])
        self.repositories = t(
            "repositories", tables.REPOSITORIES, ["hostname", "owner", "name"]
        )
        self.url_seen = t(
            "url_seen", tables.URL_SEEN, ["key_kind", "hostname", "key1", "key2"]
        )
        self.lineage = t("lineage", tables.LINEAGE, [])
        self.visit_log = t("visit_log", VISIT_LOG, [])
        self.state = t("state", STATE, ["hostname"])

    # -- helpers ---------------------------------------------------------------

    def _bucket(self, col: str) -> F.Column:
        return host_bucket(col, self.s.host_buckets)

    def _seen_keys(self, df: DataFrame, kind: str, key1, key2) -> DataFrame:
        """Project entity rows to URL_SEEN rows (D1 canonicalize-then-hash:
        hostname is already canonical here; hashing is JVM-side xxhash64)."""
        out = df.select(
            F.lit(kind).alias("key_kind"),
            F.col("hostname"),
            (key1 if key1 is not None else F.lit(None).cast("string")).alias("key1"),
            (key2 if key2 is not None else F.lit(None).cast("string")).alias("key2"),
        )
        return out.withColumn(
            "key_hash",
            url_hash(F.concat_ws("", "key_kind", "hostname", "key1", "key2")),
        ).withColumn("host_bucket", self._bucket("hostname"))

    def _new_against_seen(self, cands: DataFrame, bloom_filters) -> DataFrame:
        """Bloom-prefiltered exact anti-join against url_seen."""
        seen = self.url_seen.read(self.spark)
        key_cols = ["key_kind", "hostname", "key1", "key2"]
        if bloom_filters is not None:
            probed = bloom_mod.probe(self.spark, cands, bloom_filters)
            return dedup.seen_filter(probed, seen, key_cols, "maybe_seen").drop("maybe_seen")
        return dedup.seen_filter(cands, seen, key_cols)

    # -- lifecycle ---------------------------------------------------------------

    def init_state(self, seed_forges: DataFrame, consent: DataFrame) -> None:
        """Canonicalize seeds (D1), gate on consent (P4/P5), create forge rows
        (D2→S5) and commit the initial frontier state snapshot."""
        seeds = seed_forges.withColumn("forge_url", canonicalize_udf(F.col("hostname")))
        seeds = seeds.withColumn(
            "host", F.regexp_extract("forge_url", r"^[a-z0-9+.\-]+://([^/]+)/", 1)
        )
        gated = politeness.consent_gate(
            seeds.drop("hostname").withColumnRenamed("host", "hostname"),
            consent,
            default_rate_ms=self.s.rate_ms,
        ).filter(~F.col("imported"))  # get_all_forges(with_imports=false), spider.rs:191

        state = gated.select(
            "forge_id",
            "hostname",
            "forge_url",
            "forge_type",
            F.lit(1).alias("next_page"),
            F.lit(True).alias("active"),
            "effective_rate_ms",
            self._bucket("hostname").alias("host_bucket"),
        )
        self.state.overwrite(state, {"batch_id": 0})

        forge_rows = gated.select(
            F.col("forge_url").alias("hostname"),
            "forge_type",
            "verified_on",
            F.lit(None).cast("long").alias("last_crawl_on"),
            F.lit(False).alias("imported"),
            F.lit(None).cast("string").alias("starchart_instance"),
        )
        _, inserted = self.forges.merge_insert(self.spark, forge_rows, {"batch_id": 0})
        keys = self._seen_keys(inserted, "forge", None, None)
        self.url_seen.merge_insert(self.spark, keys, {"batch_id": 0})

    def _last_batch_id(self) -> int:
        snap = self.lineage.current_snapshot()
        if snap is None:
            return 0
        df = self.lineage.read(self.spark)
        row = df.agg(F.max("batch_id").alias("m")).collect()[0]
        return int(row["m"]) if row["m"] is not None else 0

    def run(self, documents: DataFrame, max_batches: int | None = None) -> dict:
        """Run micro-batches until the frontier drains (or max_batches).

        Idempotent and resumable: state/url_seen/entity tables are reopened
        from their current snapshots, so calling run() again after a kill
        continues where the last *committed* batch left off (a batch is
        committed only when its state snapshot lands — the final commit of
        the batch; uncommitted partial merges are absorbed by merge-insert
        idempotency, same observable end state as the reference's re-crawl,
        SURVEY.md P8).
        """
        docs = documents.withColumn("host_bucket", self._bucket("hostname"))
        docs = docs.repartition(self.s.host_buckets, "host_bucket").persist()
        batch_id = self._last_batch_id()
        batches = 0
        limit = max_batches if max_batches is not None else self.s.max_batches

        while batches < limit:
            state = self.state.read(self.spark)
            active = state.filter(F.col("active")).persist()
            if active.count() == 0:
                active.unpersist()
                break
            batch_id += 1
            batches += 1
            self._run_batch(batch_id, active, docs)
            active.unpersist()

        docs.unpersist()
        for tbl in (self.forges, self.users, self.repositories, self.url_seen,
                    self.lineage, self.visit_log, self.state):
            tbl.expire_snapshots(self.s.snapshot_keep)
        return {"batches": batches, "last_batch_id": batch_id}

    # -- one micro-batch -----------------------------------------------------------

    def _run_batch(self, batch_id: int, active: DataFrame, docs: DataFrame) -> None:
        s = self.s
        # 1. page-fetch URLs for each active host (JVM-side string build),
        # templated per forge type (N1 dispatch starts at URL construction)
        page_url = (
            F.when(
                F.col("forge_type") == "github",
                F.concat(
                    F.lit("https://"), F.col("hostname"),
                    F.lit("/search/repositories?q=forge&page="), F.col("next_page"),
                    F.lit(f"&per_page={s.items_per_api_call}"),
                ),
            )
            .when(
                F.col("forge_type") == "sourcehut",
                F.concat(
                    F.lit("https://"), F.col("hostname"),
                    F.lit("/api/repos?page="), F.col("next_page"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("https://"), F.col("hostname"),
                    F.lit(f"{normalize.SEARCH_PATH}?page="), F.col("next_page"),
                    F.lit(f"&limit={s.items_per_api_call}"),
                )
            )
        )
        pages = active.select(
            "forge_id", "hostname", "forge_url", "forge_type", "next_page",
            "effective_rate_ms", "host_bucket",
            page_url.alias("doc_id"),
        )

        # 2. fetch = co-partitioned join against documents (left: missing page
        # == empty page == termination sentinel, spider.rs:74-77)
        fetched_pages = pages.join(
            docs.select("doc_id", "spans", "host_bucket").withColumnRenamed(
                "host_bucket", "hb_doc"
            ),
            "doc_id",
            "left",
        ).drop("hb_doc")

        parsed = normalize.parse_search_pages_typed(
            fetched_pages.filter(F.col("spans").isNotNull()).select(
                "doc_id", "hostname", "spans", "forge_type"
            )
        )
        # re-attach frontier metadata
        meta = pages.select(
            "doc_id", "forge_id", "forge_url", "forge_type", "effective_rate_ms",
            "host_bucket",
        )
        repo_rows = parsed.join(meta, "doc_id")

        # 3. politeness: fetch list = page fetch (idx 0) + one topics call per
        # repo in page order (P1: ≥rate between calls within a host). Only
        # gitea needs the second topics fetch; github ships topics inline and
        # sourcehut has none (S4 is forge-type-specific).
        topic_fetches = repo_rows.filter(F.col("forge_type") == "gitea").select(
            "hostname", "forge_id", "page", "idx_in_page", "effective_rate_ms",
            "host_bucket",
            F.concat(
                F.lit("https://"), F.col("hostname"), F.lit("/api/v1/repos/"),
                F.col("owner_username"), F.lit("/"), F.col("name"), F.lit("/topics"),
            ).alias("doc_id"),
        )
        page_fetches = fetched_pages.select(
            "hostname", "forge_id",
            F.col("next_page").alias("page"),
            F.lit(0).alias("idx_in_page"),
            "effective_rate_ms", "host_bucket", "doc_id",
        )
        all_fetches = page_fetches.unionByName(topic_fetches)
        slotted = politeness.assign_slots_token_bucket(
            all_fetches, order_cols=["page", "idx_in_page"]
        )
        scheduled, deferred = politeness.split_by_budget(slotted, s.budget_ms)
        scheduled = scheduled.persist()
        deferred = deferred.persist()
        # deferral unit = whole page: a page whose own fetch (idx 0) deferred
        # stays queued; hosts keep next_page unchanged
        deferred_page_hosts = (
            deferred.filter(F.col("idx_in_page") == 0).select("hostname").distinct()
        )
        sched_repo_rows = repo_rows.join(
            deferred_page_hosts, "hostname", "left_anti"
        ).persist()

        # 4. topics "fetch" + parse + J4 grouped join (no N+1)
        topics_raw = scheduled.filter(F.col("idx_in_page") > 0).join(
            docs.select("doc_id", "spans"), "doc_id", "left"
        )
        topics = normalize.parse_gitea_topics_pages(
            topics_raw.filter(F.col("spans").isNotNull()).select(
                "doc_id", "hostname", "spans"
            )
        )

        # 5. normalize + in-batch dedup
        user_cands = normalize.normalize_users(sched_repo_rows)
        user_first = dedup.keep_first(
            user_cands, ["hostname", "username"], ["page", "idx_in_page"]
        )
        repo_cands = normalize.normalize_repositories(sched_repo_rows, topics)

        # 6. seen filter (bloom prefilter + exact anti-join) and MERGE sinks
        bloom_filters = None
        if s.use_bloom:
            seen_now = self.url_seen.read(self.spark)
            bloom_filters = bloom_mod.build(seen_now).persist()

        u_keyed = (
            user_first.withColumn("key_kind", F.lit("user"))
            .withColumn("key1", F.col("username"))
            .withColumn("key2", F.lit(None).cast("string"))
            .withColumn(
                "key_hash",
                url_hash(F.concat_ws("", "key_kind", "hostname", "key1", "key2")),
            )
            .withColumn("host_bucket", self._bucket("hostname"))
        )
        u_new = self._new_against_seen(u_keyed, bloom_filters)
        _, u_ins = self.users.merge_insert(self.spark, u_new, {"batch_id": batch_id})
        self.url_seen.merge_insert(
            self.spark, self._seen_keys(u_ins, "user", F.col("username"), None),
            {"batch_id": batch_id},
        )

        rkeys_df = repo_cands.withColumn("key_kind", F.lit("repo")).withColumn(
            "key1", F.col("name")
        ).withColumn("key2", F.col("owner")).withColumn(
            "key_hash",
            url_hash(F.concat_ws("", "key_kind", "hostname", "key1", "key2")),
        ).withColumn("host_bucket", self._bucket("hostname"))
        r_new = self._new_against_seen(rkeys_df, bloom_filters)
        _, r_ins = self.repositories.merge_insert(
            self.spark,
            dedup.keep_first(
                r_new, ["hostname", "owner", "name"], ["page", "idx_in_page"]
            ),
            {"batch_id": batch_id},
        )
        self.url_seen.merge_insert(
            self.spark, self._seen_keys(r_ins, "repo", F.col("name"), F.col("owner")),
            {"batch_id": batch_id},
        )
        if bloom_filters is not None:
            bloom_filters.unpersist()

        # 7. visit log (pure-function crawl order evidence)
        visits = scheduled.join(deferred_page_hosts, "hostname", "left_anti").select(
            F.lit(batch_id).alias("batch_id"),
            "forge_id", "hostname", "page", "idx_in_page", "doc_id",
        )
        self.visit_log.append(visits, {"batch_id": batch_id})

        # 8. lineage counters per partition (A3 / north_rule)
        fetched_n = scheduled.join(deferred_page_hosts, "hostname", "left_anti")
        counts = (
            fetched_n.groupBy("host_bucket")
            .agg(F.count(F.lit(1)).alias("fetched"))
            .join(
                deferred.groupBy("host_bucket").agg(
                    F.count(F.lit(1)).alias("deferred_by_politeness")
                ),
                "host_bucket",
                "full",
            )
        )
        cand_n = (
            user_first.select(self._bucket("hostname").alias("host_bucket"))
            .unionByName(repo_cands.select(self._bucket("hostname").alias("host_bucket")))
            .groupBy("host_bucket").agg(F.count(F.lit(1)).alias("cands"))
        )
        ins_n = (
            u_ins.select(self._bucket("hostname").alias("host_bucket"))
            .unionByName(r_ins.select(self._bucket("hostname").alias("host_bucket")))
            .groupBy("host_bucket").agg(F.count(F.lit(1)).alias("ins"))
        )
        lineage = (
            counts.join(cand_n, "host_bucket", "full").join(ins_n, "host_bucket", "full")
            .select(
                F.lit(batch_id).alias("batch_id"),
                F.col("host_bucket").alias("partition_id"),
                F.coalesce("fetched", F.lit(0)).alias("fetched"),
                (F.coalesce("cands", F.lit(0)) - F.coalesce("ins", F.lit(0))).alias("deduped"),
                F.coalesce("deferred_by_politeness", F.lit(0)).alias("deferred_by_politeness"),
            )
        )
        self.lineage.append(lineage, {"batch_id": batch_id})

        # 9. state advance — THE commit point of the batch.
        # Termination (A2, spider.rs:74-77): an existing page with zero repos
        # is the sentinel — it IS fetched (and logged), then the host stops.
        host_repo_counts = repo_rows.groupBy("hostname").agg(
            F.count(F.lit(1)).alias("__n_repos")
        )
        page_status = (
            fetched_pages.select(
                "hostname", F.col("spans").isNotNull().alias("page_found")
            )
            .join(host_repo_counts, "hostname", "left")
            .join(
                deferred_page_hosts.withColumn("__deferred", F.lit(True)),
                "hostname",
                "left",
            )
        )
        got_repos = F.col("page_found") & F.col("__n_repos").isNotNull()
        new_state = (
            self.state.read(self.spark)
            .join(page_status, "hostname", "left")
            .select(
                "forge_id", "hostname", "forge_url", "forge_type",
                F.when(F.col("__deferred").isNotNull(), F.col("next_page"))
                .when(got_repos, F.col("next_page") + 1)
                .otherwise(F.col("next_page"))
                .alias("next_page"),
                F.when(F.col("__deferred").isNotNull(), F.lit(True))
                .when(F.col("page_found").isNull(), F.col("active"))
                .when(got_repos, F.lit(True))
                .otherwise(F.lit(False))
                .alias("active"),
                "effective_rate_ms", "host_bucket",
            )
        )
        self.state.overwrite(new_state, {"batch_id": batch_id})

        scheduled.unpersist()
        deferred.unpersist()
        sched_repo_rows.unpersist()

    # -- derived outputs -------------------------------------------------------------

    def crawl_order(self) -> DataFrame:
        """Golden-comparable visit order: pure function of (forge_id, page,
        idx_in_page) — SURVEY.md §3.1/§7."""
        from pyspark.sql import Window

        log = self.visit_log.read(self.spark)
        w = Window.orderBy("forge_id", "page", "idx_in_page")
        return log.select(
            "hostname", "page", "idx_in_page", "doc_id",
            (F.row_number().over(w) - 1).cast("long").alias("seq"),
        )
