"""End-to-end near-duplicate detection + clustering pipeline.

The Spark shape of the reference's verify lifecycle (SURVEY §3.1):

    pages → extract (pandas UDF) → docs (content_sha, shingles)
          → [exact branch | MinHash→LSH branch | SimHash branch | anchor branch]
          → union candidate pairs → exact-Jaccard / substring verification
          → pair scoring → connected components → representatives

Candidate generation and hydration — two different *systems* in the
reference (gnmatcher + PostgreSQL) — collapse into joins inside one
engine. Every stage checkpoints through CheckpointIO so a killed run
resumes (north_rule), and per-stage metrics record docs/sec.

Scale defaults baked in: html is dropped immediately after extraction
(column pruning — it dominates bytes, SURVEY §4 P2); exact-dup
representatives screen the corpus before the expensive branches (early-
exit cascade P3); every candidate source caps hot buckets and logs the
overflow (P5); pair tables stay flat — nothing is collect_list'd until
the reporting edge.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gnames_spark.checkpoint import ParquetCheckpointIO
from gnames_spark.config import DedupConfig
from gnames_spark.functions.extraction import extract_text
from gnames_spark.functions.sigkernel import make_shingle_set_udf, make_signature_udf
from gnames_spark.metrics import MetricsCollector
from gnames_spark.operators.components import all_components, connected_components
from gnames_spark.operators.exact import (
    distinct_content,
    exact_dup_edges,
    with_content_sha,
)
from gnames_spark.operators.incremental import (
    incremental_posting_pairs,
    merge_cluster_summary,
    merge_components,
    tag_postings,
)
from gnames_spark.operators.embeddings import (
    ann_dup_pairs,
    cosine_similarity_col,
    derive_sign_banding,
    make_banded_hyperplane_udf,
)
from gnames_spark.operators.lsh import candidate_pairs as lsh_bucket_pairs
from gnames_spark.operators.lsh import capped_buckets
from gnames_spark.operators.representatives import cluster_summary, select_representatives
from gnames_spark.operators.scoring import method_rank_col, pair_score
from gnames_spark.operators.simhash_join import simhash_candidates, simhash_chunks
from gnames_spark.operators.suffix import anchor_pairs_from_anchors, substring_verify
from gnames_spark.operators.verify import verify_pairs


class DedupPipeline:
    """Orchestrates the stages; with a checkpoint root, every stage is
    resumable and metered."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        checkpoint_root: str | None = None,
        run_id: str | None = None,
        enable_simhash: bool = True,
        enable_substring: bool = True,
        cc_checkpoint_rounds: bool = False,
        route_overflow_to_lcs: bool = False,
    ):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.cfg.validate()
        self.metrics = MetricsCollector(run_id or uuid.uuid4().hex[:12])
        self.io = (
            ParquetCheckpointIO(checkpoint_root, self.cfg.config_hash())
            if checkpoint_root
            else None
        )
        self.enable_simhash = enable_simhash
        self.enable_substring = enable_substring
        # route each CC round through the reliable checkpoint store
        # (survives executor loss mid-loop; resumes at the first missing
        # round) instead of executor-local blocks. Off by default in the
        # sandbox — localCheckpoint is faster and single-JVM local mode
        # cannot lose an executor. Turn ON for cluster runs.
        self.cc_checkpoint_rounds = cc_checkpoint_rounds and self.io is not None
        # anchor_cap recall policy. The cap drops hot anchor buckets, so
        # a pair whose shared anchors ALL sat in overflowed buckets loses
        # its anchor tag and (by default) skips the substring LCS check —
        # a DELIBERATE recall bound, not an accident: overflowed anchor
        # buckets are boilerplate families at web scale (measured: at 30k
        # synthetic pages 36 overflowed buckets covered 11k docs, and
        # routing their Jaccard-failed pairs to LCS passed 143k
        # chrome-sharing pairs — re-creating the quadratic flood the cap
        # exists to stop AND merging pages that share only template
        # chrome). Set route_overflow_to_lcs=True to trade that cost for
        # full PartialExact recall on overflowed buckets; either way the
        # overflow volume is logged per run (never silent).
        self.route_overflow_to_lcs = route_overflow_to_lcs
        self._overflow_cache: list[DataFrame] = []
        # stage-name namespace: run_incremental() prefixes every stage
        # ("inc_docs", "inc_verified_pairs", ...) so an increment's
        # checkpoints never collide with (or wrongly reuse) the base
        # run's stages in the same store
        self._stage_ns = ""

    # -- stage helper ------------------------------------------------
    def _stage(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        name = self._stage_ns + name
        if self.io is not None:
            df, res = self.io.write_or_reuse(self.spark, name, build, partition_by)
            self.metrics.record(name, res.rows, res.secs, reused=res.reused)
            return df
        # no checkpoint store: localCheckpoint (persist + LINEAGE CUT) so
        # downstream stages (each consumed 2-4x) never recompute upstream
        # work — the in-memory analog of the checkpoint write. The
        # lineage cut matters as much as the caching: with plain persist
        # the logical plan of every stage nests all upstream plans, and
        # driver-side analysis goes combinatorial once run_incremental
        # unions base-run lineages into increment stages (measured: a
        # count over a 1,321-row persisted table spent 96 s in the
        # analyzer before this cut).
        import time as _time

        t0 = _time.monotonic()
        df = build().localCheckpoint(eager=True)
        rows = df.count()
        self.metrics.record(name, rows, _time.monotonic() - t0)
        return df

    def _record_overflow(self, name: str, overflow: DataFrame) -> DataFrame:
        """Hot-bucket truncation is NEVER silent (north_rule / SURVEY §4
        P5): record how many buckets were dropped and how many docs they
        held — the analog of the reference logging skipped-record counts.

        The overflow DF is persisted first: it is consumed twice (this
        stats collect + the branch's anti-join) and is tiny. The
        persisted handle is returned so the candidates stage can
        unpersist it once the stage is materialized (otherwise cached
        partitions accumulate for the session lifetime)."""
        overflow = overflow.persist()
        self._overflow_cache.append(overflow)
        row = overflow.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs")
        ).collect()[0]
        self.metrics.record(self._stage_ns + name, int(row["n"]), 0.0, dropped_docs=int(row["docs"]))
        return overflow

    @staticmethod
    def _strongest_with_overflow(branches: list[DataFrame], overflow_docs: DataFrame | None) -> DataFrame:
        """Union candidate branches, keep the strongest method per pair,
        and attach the anchor_overflow flag (shared tail of the full and
        incremental candidate stages). anchor outranks lsh/simhash: the
        verified stage routes Jaccard-failed anchor pairs into the
        substring LCS check, so a pair co-detected by lsh must not lose
        its anchor tag (a substring dup at J<tau would silently skip LCS
        otherwise)."""
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        out = (
            out.groupBy("doc_a", "doc_b")
            .agg(F.max_by("method", F.when(F.col("method") == "exact", 4)
                          .when(F.col("method") == "anchor", 3)
                          .when(F.col("method") == "lsh", 2)
                          .otherwise(1)).alias("method"))
        )
        if overflow_docs is None:
            return out.withColumn("anchor_overflow", F.lit(False))
        ova = overflow_docs.select(
            F.col("doc_id").alias("doc_a"), F.col("_anchor_ov").alias("_ova")
        )
        ovb = overflow_docs.select(
            F.col("doc_id").alias("doc_b"), F.col("_anchor_ov").alias("_ovb")
        )
        return (
            out.join(F.broadcast(ova), "doc_a", "left")
            .join(F.broadcast(ovb), "doc_b", "left")
            .withColumn(
                "anchor_overflow",
                F.coalesce("_ova", F.lit(False)) | F.coalesce("_ovb", F.lit(False)),
            )
            .drop("_ova", "_ovb")
        )

    # -- stages --------------------------------------------------------
    # The full hygiene chain is the composition of the two phases below;
    # prepare_docs / preclean_report run them with html extraction
    # BETWEEN (cheap-screen-before-expensive-work: blocked/stale pages
    # must never pay the extraction kernel — the same discipline as the
    # reference's bloom→trie→DB cascade,
    # /root/reference/PLAN_gnmatcher_embed.md:14-18). There is
    # deliberately no composed helper: a second entry point to the same
    # chain is exactly what let the report and pipeline paths drift
    # before the split.

    def _apply_url_preclean(
        self, df: DataFrame, audit: list | None = None
    ) -> DataFrame:
        """URL-level hygiene gates (domain blocklist, URL snapshot
        collapse) — they read only ``url``/``warc_ts``, so they run
        BEFORE html extraction and blocked/stale pages never pay the
        extraction kernel. With ``audit`` (a list), each gate appends
        (gate, n_in, n_out, detail) — counting costs extra jobs, so the
        pipeline path passes None and pays nothing. Unlike the text
        phase, audit mode NEVER checkpoints here: the input may still
        carry the raw ``html`` bytes (checkpointing would pin the whole
        crawl to executor storage for a diagnostic), and the audit
        counts only project url/warc_ts — column pruning keeps the
        recomputation of these two cheap gates off the html column
        entirely."""
        cfg = self.cfg
        auditing = audit is not None

        if cfg.blocked_domains:
            from gnames_spark.functions.urlnorm import filter_blocked_domains

            n_in = df.count() if auditing else None
            df = filter_blocked_domains(
                df, list(cfg.blocked_domains), id_col="url"
            )
            if auditing:
                audit.append(
                    ("blocked_domains", n_in, df.count(),
                     f"{len(cfg.blocked_domains)} blocked domains "
                     f"(exact + subdomains)")
                )
        if cfg.collapse_url_snapshots:
            from gnames_spark.functions.urlnorm import latest_snapshot

            if "warc_ts" not in df.columns:
                raise ValueError("collapse_url_snapshots needs a warc_ts column")
            n_in = df.count() if auditing else None
            df = latest_snapshot(df, ts_col="warc_ts", id_col="url").drop(
                "canonical_url", "n_snapshots"
            )
            if auditing:
                audit.append(
                    ("collapse_url_snapshots", n_in, df.count(),
                     "kept newest capture per canonical URL")
                )
        return df

    def _apply_text_preclean(
        self, df: DataFrame, audit: list | None = None
    ) -> DataFrame:
        """Text-level hygiene gates (boilerplate line strip → repetition
        gate → PII redaction) — they read ``text``, so they run AFTER
        html extraction. Same audit contract as the URL phase, but here
        audit mode DOES checkpoint each gate boundary: the gates are
        expensive (line/gram shuffles) and the input is html-free, so a
        count never recomputes the gates before it."""
        cfg = self.cfg
        auditing = audit is not None

        def ckpt(d: DataFrame) -> DataFrame:
            return d.localCheckpoint(eager=True) if auditing else d

        if (
            cfg.strip_shared_lines_min_docs is not None
            or cfg.max_dup_line_frac is not None
            or cfg.max_top_gram_frac is not None
        ) and not auditing:
            # the line/repetition ops below reference df from several
            # branches (lines, hot-line agg, join-back); cut lineage
            # ONCE so extraction (the most expensive map in the
            # pipeline) and the source scan run once, not per branch —
            # the same localCheckpoint idiom as every stage boundary
            df = df.localCheckpoint(eager=True)
        if cfg.strip_shared_lines_min_docs is not None:
            from gnames_spark.operators.linededup import strip_shared_lines

            stripped = strip_shared_lines(
                df, cfg.strip_shared_lines_min_docs, id_col="url"
            )
            if auditing:
                n_in = df.count()
                n_lines = stripped.agg(
                    F.sum("n_shared_lines").alias("s")
                ).collect()[0]["s"] or 0
            df = ckpt(stripped.drop("n_lines", "n_shared_lines"))
            if auditing:
                audit.append(
                    ("strip_shared_lines", n_in, df.count(),
                     f"{n_lines} boilerplate line occurrences removed")
                )
        if cfg.max_dup_line_frac is not None or cfg.max_top_gram_frac is not None:
            from gnames_spark.operators.repetition import repetition_stats

            n_in = df.count() if auditing else None
            stats = repetition_stats(df, id_col="url").select(
                "url", "dup_line_frac", "top_gram_frac"
            )
            df = ckpt(
                df.join(stats, "url", "left").filter(
                    (F.coalesce(F.col("dup_line_frac"), F.lit(0.0))
                     <= (cfg.max_dup_line_frac if cfg.max_dup_line_frac is not None else 1.0))
                    & (F.coalesce(F.col("top_gram_frac"), F.lit(0.0))
                       <= (cfg.max_top_gram_frac if cfg.max_top_gram_frac is not None else 1.0))
                ).drop("dup_line_frac", "top_gram_frac")
            )
            if auditing:
                audit.append(
                    ("repetition_gate", n_in, df.count(),
                     f"dup_line_frac <= {cfg.max_dup_line_frac}, "
                     f"top_gram_frac <= {cfg.max_top_gram_frac}")
                )
        if cfg.redact_pii:
            from gnames_spark.functions.pii import redact_pii

            if auditing:
                n_in = df.count()
                red = ckpt(df.withColumn("_redacted", redact_pii("text")))
                touched = red.filter(F.col("_redacted") != F.col("text")).count()
                df = red.drop("text").withColumnRenamed("_redacted", "text")
                audit.append(
                    ("redact_pii", n_in, n_in, f"{touched} docs had PII redacted")
                )
            else:
                df = df.withColumn("text", redact_pii("text"))
        return df

    def preclean_report(self, pages: DataFrame) -> DataFrame:
        """Diagnostic: per-gate (gate, n_in, n_out, detail) for the
        configured hygiene gates over these pages — the operational
        'what did each gate cost me' report, without running the dedup
        stages. Runs the EXACT chain prepare_docs runs (shared code
        path; tests pin the final count against prepare_docs)."""
        audit: list = []
        df = self._apply_url_preclean(pages, audit)
        if "html" in df.columns:
            df = df.withColumn("text", extract_text("html")).drop("html")
        df = df.localCheckpoint(eager=True)
        out = self._apply_text_preclean(df, audit)
        if self.cfg.lang_filter is not None:
            n_in = out.count()
            kept = out.filter(F.col("lang") == self.cfg.lang_filter)
            audit.append(
                ("lang_filter", n_in, kept.count(),
                 f"lang == {self.cfg.lang_filter}")
            )
        if not audit:
            n = df.count()
            audit.append(("no_gates_configured", n, n, ""))
        return self.spark.createDataFrame(
            audit, "gate string, n_in long, n_out long, detail string"
        )

    def prepare_docs(self, pages: DataFrame) -> DataFrame:
        """pages(url, html[, text]) → docs(doc_id, url, text, lang,
        content_sha, n_chars). html is extracted then DROPPED.

        Optional crawl-hygiene pre-clean (config-gated, see
        DedupConfig): snapshot collapse → boilerplate line strip →
        repetition gate — all BEFORE content_sha, so the exact screen
        sees cleaned bytes (two pages differing only by a cookie
        banner become exact dups after the strip). The URL-level gates
        (domain blocklist, snapshot collapse) run BEFORE html
        extraction — on a real crawl they drop 30-50% of pages, and
        those pages must never pay the most expensive kernel in the
        pipeline (pinned by
        tests/test_pipeline.py::TestPrecleanOrdering)."""
        cfg = self.cfg

        def build():
            df = self._apply_url_preclean(pages)
            if "html" in df.columns:
                df = df.withColumn("text", extract_text("html")).drop("html")
            df = self._apply_text_preclean(df)
            if cfg.lang_filter is not None:
                df = df.filter(F.col("lang") == cfg.lang_filter)
            if "doc_id" not in df.columns:
                # deterministic content-independent id (UUIDv5-of-url analog,
                # /root/reference/pkg/gnames_verif.go:48)
                df = df.withColumn("doc_id", F.xxhash64("url"))
            df = with_content_sha(df)
            return df.withColumn("n_chars", F.length("text"))

        return self._stage("docs", build)

    def signatures(self, docs: DataFrame) -> DataFrame:
        """One row per DISTINCT content: LSH band hashes + simhash +
        shingle count + anchor sample, all from ONE fused Arrow kernel
        (functions/sigkernel.py — no interpreted JVM lambdas, no wide
        shingle arrays stored).

        Exact duplicates are signed once (early-exit cascade) — at web
        scale this is a huge saving (Common Crawl is ~50%+ exact dups).
        """
        cfg = self.cfg

        def build():
            reps = distinct_content(docs)
            sig = make_signature_udf(cfg)
            return (
                reps.select("doc_id", sig(F.col("text")).alias("sig"))
                .select("doc_id", "sig.bands", "sig.simhash", "sig.n_shingles", "sig.anchors")
                .withColumn("config_hash", F.lit(cfg.config_hash()))
            )

        return self._stage("signatures", build)

    def candidates(self, docs: DataFrame, signatures: DataFrame) -> DataFrame:
        """Union of the candidate branches (U2 analog: the reference
        unions canonical+virus hydration results,
        /root/reference/internal/io/pgio/match_records_map.go:143-144)."""
        cfg = self.cfg

        def build():
            exact = exact_dup_edges(docs).select("doc_a", "doc_b", "method")
            nonempty = signatures.filter(F.col("n_shingles") > 0)
            buckets = nonempty.select(
                "doc_id", F.posexplode("bands").alias("band", "bucket_hash")
            )
            kept, lsh_overflow = capped_buckets(buckets, cfg)
            lsh_pairs = lsh_bucket_pairs(kept, cfg, dedup=False)
            self._record_overflow("lsh_overflow_buckets", lsh_overflow)
            branches = [exact, lsh_pairs.select("doc_a", "doc_b", "method")]
            if self.enable_simhash:
                sim_pairs, sim_overflow = simhash_candidates(
                    nonempty.select("doc_id", "simhash"), cfg, dedup=False
                )
                self._record_overflow("simhash_overflow_chunks", sim_overflow)
                branches.append(sim_pairs.select("doc_a", "doc_b", "method"))
            overflow_docs = None
            if self.enable_substring:
                anchors = nonempty.select("doc_id", F.explode("anchors").alias("anchor"))
                anc_pairs, anc_overflow = anchor_pairs_from_anchors(
                    anchors, cfg, dedup=False
                )
                anc_overflow = self._record_overflow("anchor_overflow", anc_overflow)
                branches.append(anc_pairs.select("doc_a", "doc_b", "method"))
                # docs whose anchors sat in a dropped (overflowed) bucket
                # lost their chance at the anchor tag — remember them so
                # the verify stage can still route their Jaccard-failed
                # pairs to the substring LCS check (cap must truncate
                # work, never silently truncate RECALL)
                overflow_docs = (
                    anchors.join(anc_overflow.select("anchor"), "anchor", "left_semi")
                    .select("doc_id")
                    .distinct()
                    .withColumn("_anchor_ov", F.lit(True))
                )
            return self._strongest_with_overflow(branches, overflow_docs)

        df = self._stage("candidate_pairs", build)
        # overflow stats were double-consumed (collect + anti-join);
        # stage is materialized now, so release the cached partitions
        for o in self._overflow_cache:
            o.unpersist()
        self._overflow_cache.clear()
        return df

    def verified(self, candidates: DataFrame, signatures: DataFrame, docs: DataFrame) -> DataFrame:
        cfg = self.cfg

        def build():
            # exact-method pairs are already proven (byte identity)
            exact = candidates.filter(F.col("method") == "exact").withColumn(
                "jaccard", F.lit(1.0)
            ).withColumn("passed", F.lit(True))
            rest = candidates.filter(F.col("method") != "exact")
            # size-ratio prefilter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
            # so an lsh/simhash pair whose shingle-count ratio is below
            # the threshold CANNOT pass Jaccard — drop it before the
            # (expensive) set hydration + intersection. n_shingles is
            # already in the narrow signatures table; the two joins ride
            # the same doc_id shuffle the hydration would have paid.
            # Round-1 measurement: the simhash branch alone fed ~500k
            # boilerplate pairs into verify at 120k docs; most die here.
            # anchor-tagged pairs are exempt (their Jaccard failure
            # routes them to the substring LCS check, a path that must
            # survive regardless of set-size skew); overflow-flagged
            # pairs are exempt ONLY when route_overflow_to_lcs is on —
            # with routing off (default) they can never reach LCS, so
            # exempting them just bought 143k useless hydrations per 30k
            # docs (measured: every one died at Jaccard).
            nsz = signatures.select("doc_id", "n_shingles")
            na = nsz.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("_na"))
            nb = nsz.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("_nb"))
            sized = rest.join(na, "doc_a", "left").join(nb, "doc_b", "left")
            ratio_fail = (
                F.least("_na", "_nb")
                < F.lit(cfg.jaccard_threshold) * F.greatest("_na", "_nb")
            )
            lcs_exempt = F.col("method") == "anchor"
            if self.route_overflow_to_lcs:
                lcs_exempt = lcs_exempt | F.col("anchor_overflow")
            prunable = ratio_fail & ~lcs_exempt & F.col("_na").isNotNull() & F.col("_nb").isNotNull()
            pruned = (
                sized.filter(prunable)
                .select("doc_a", "doc_b", "method", "anchor_overflow")
                .withColumn("jaccard", F.lit(0.0))
                .withColumn("passed", F.lit(False))
            )
            rest = sized.filter(~prunable).drop("_na", "_nb")
            # join-back hydration: recompute shingle sets (same kernel →
            # identical hashes) for ONLY the docs that appear in a pair —
            # cheaper at every scale than storing/shuffling the wide
            # shingle arrays for the whole corpus
            participants = (
                rest.select(F.col("doc_a").alias("doc_id"))
                .union(rest.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            set_udf = make_shingle_set_udf(cfg)
            sets = (
                docs.join(participants, "doc_id", "left_semi")
                .select("doc_id", set_udf(F.col("text")).alias("shingle_set"))
            )
            ver = verify_pairs(rest, sets, cfg, set_col="shingle_set").unionByName(
                pruned.select(*rest.columns, "jaccard", "passed")
            )
            if self.enable_substring:
                # Jaccard-failed ANCHOR pairs get the substring check
                # (PartialExact). Only the anchor method indicates a
                # possible long shared run: winnowing guarantees any
                # >= min_substring_len shared substring produced a
                # shared anchor, so lsh/simhash-only failures cannot be
                # substring dups — skipping them keeps the expensive
                # LCS kernel off the boilerplate cross-pair flood.
                # EXCEPTION (opt-in): anchor_cap drops hot anchor
                # buckets before pair generation, so a doc whose anchors
                # overflowed may carry a genuine substring dup without
                # the anchor tag. With route_overflow_to_lcs=True those
                # pairs (flagged anchor_overflow by the candidates
                # stage) are routed to LCS regardless of method — full
                # PartialExact recall, at boilerplate-flood cost (see
                # __init__ docstring for the measured tradeoff).
                route = F.col("method") == "anchor"
                if self.route_overflow_to_lcs:
                    route = route | F.col("anchor_overflow")
                failed = ver.filter((~F.col("passed")) & route).select("doc_a", "doc_b")
                sub = substring_verify(failed, docs, cfg).filter("passed")
                sub_edges = sub.select(
                    "doc_a", "doc_b", F.lit("suffix").alias("method"),
                    F.lit(0.0).alias("jaccard"), F.lit(True).alias("passed"),
                )
                ver = ver.select("doc_a", "doc_b", "method", "jaccard", "passed").unionByName(
                    sub_edges
                ).groupBy("doc_a", "doc_b").agg(
                    F.max_by("method", F.when(F.col("passed"), 2).otherwise(1)).alias("method"),
                    F.max("jaccard").alias("jaccard"),
                    F.max("passed").alias("passed"),
                )
            else:
                ver = ver.select("doc_a", "doc_b", "method", "jaccard", "passed")
            out = exact.select("doc_a", "doc_b", "method", "jaccard", "passed").unionByName(ver)
            return out.withColumn("score", pair_score(hamming_col=None))

        return self._stage("verified_pairs", build)

    def components(self, docs: DataFrame, verified: DataFrame) -> DataFrame:
        cfg = self.cfg

        def build():
            edges = (
                verified.filter("passed")
                .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            )
            assign = connected_components(
                edges,
                max_iterations=cfg.max_cc_iterations,
                io=self.io if self.cc_checkpoint_rounds else None,
                salt_buckets=cfg.cc_salt_buckets,
            )
            # exact-dup members share content_sha with the signed
            # representative; they inherit its component through the
            # exact star edges already present in `edges`.
            return all_components(docs, assign)

        return self._stage("components", build)

    def run(
        self, pages: DataFrame, embeddings: DataFrame | None = None
    ) -> dict[str, DataFrame]:
        """End-to-end run. ``embeddings`` (optional): a (doc_id,
        embedding) table keyed like the docs — when supplied, the
        embedding-cosine modality contributes verified edges (semantic
        twins whose text differs) to the same component clustering; when
        absent, plans are bit-identical to the text-only pipeline."""
        docs = self.prepare_docs(pages)
        sigs = self.signatures(docs)
        cands = self.candidates(docs, sigs)
        ver = self.verified(cands, sigs, docs)
        out: dict[str, DataFrame] = {}
        if embeddings is not None:
            emb = self.embedding_pairs(embeddings)
            ver = self.merge_verified(ver, emb)
            out["embedding_pairs"] = emb
        comps = self.components(docs, ver)
        reps = select_representatives(comps)
        summary = cluster_summary(comps)
        out.update({
            "docs": docs,
            "signatures": sigs,
            "candidate_pairs": cands,
            "verified_pairs": ver,
            "components": comps,
            "representatives": reps,
            "cluster_summary": summary,
        })
        return out

    def embedding_pairs(self, embeddings: DataFrame) -> DataFrame:
        """The embedding-cosine near-dup modality: banded sign-LSH
        candidates (size-aware banding — never n²) + exact-cosine verify
        at ``cfg.emb_threshold`` (operators/embeddings.ann_dup_pairs).
        Returns verified-shaped edges with ``method='embedding'`` and
        the cosine carried alongside; hot buckets are capped at
        ``cfg.emb_bucket_cap`` and logged like every other branch.

        This is the one modality that catches semantic twins whose TEXT
        differs (paraphrase, near-rewrite) — byte/shingle methods cannot.
        Incremental analog: sign-LSH postings are (band, bucket) rows,
        the same shape tag_postings/incremental_posting_pairs already
        one-side for LSH/SimHash — see run_incremental's docstring."""
        cfg = self.cfg

        def build():
            first = (
                embeddings.select("embedding")
                .filter(F.col("embedding").isNotNull())
                .first()
            )
            if first is None:
                return self.spark.createDataFrame(
                    [],
                    "doc_a long, doc_b long, method string, jaccard double, "
                    "passed boolean, cosine double",
                )
            dim = len(first[0])
            n_hint = embeddings.count()
            pairs, overflow = ann_dup_pairs(
                embeddings,
                cfg.emb_threshold,
                dim=dim,
                id_col="doc_id",
                vec_col="embedding",
                bucket_cap=cfg.emb_bucket_cap,
                n_vectors_hint=n_hint,
            )
            self._record_overflow(
                "emb_overflow_buckets", overflow.withColumnRenamed("n_vecs", "n_docs")
            )
            return pairs.select(
                F.col("id_a").alias("doc_a"),
                F.col("id_b").alias("doc_b"),
                F.lit("embedding").alias("method"),
                F.lit(None).cast("double").alias("jaccard"),
                F.lit(True).alias("passed"),
                F.col("cosine"),
            )

        df = self._stage("embedding_pairs", build)
        for o in self._overflow_cache:
            o.unpersist()
        self._overflow_cache.clear()
        return df

    def _incremental_embedding_pairs(
        self, base_emb: DataFrame | None, new_emb: DataFrame
    ) -> DataFrame:
        """One-sided embedding candidate generation for an increment:
        sign-LSH postings over base+new (banding derived from the
        COMBINED size — exactly what a fresh run over old ∪ new would
        derive, so the identity-with-fresh-run property the rest of the
        incremental suite proves extends to this branch), caps see true
        combined bucket sizes, the pair join probes only increment
        postings (old-vs-old pairs never generate — their edges live in
        the base verified set), exact-cosine verify hydrates only pair
        participants.

        Unlike the text path (whose band columns are STORED in the
        signatures table), base postings recompute here each increment —
        a map-only hyperplane matmul over the base embeddings, no base
        shuffle; to store them instead, pin the banding in config and
        persist the posting table (the optimization is a caching choice,
        not a semantic one)."""
        cfg = self.cfg

        def build():
            empty = (
                "doc_a long, doc_b long, method string, jaccard double, "
                "passed boolean, cosine double"
            )
            first = (
                new_emb.select("embedding").filter(F.col("embedding").isNotNull()).first()
            )
            if first is None:
                return self.spark.createDataFrame([], empty)
            dim = len(first[0])
            n_total = new_emb.count() + (base_emb.count() if base_emb is not None else 0)
            bits, bands = derive_sign_banding(cfg.emb_threshold, n_total)
            sig = make_banded_hyperplane_udf(dim, bands, bits, seed=42)

            def postings(df):
                return df.select(
                    "doc_id", F.posexplode(sig(F.col("embedding"))).alias("band", "bucket")
                )

            base_p = (
                postings(base_emb)
                if base_emb is not None
                else self.spark.createDataFrame([], "doc_id long, band int, bucket long")
            )
            all_p = tag_postings(base_p, postings(new_emb))
            counts = all_p.groupBy("band", "bucket").agg(F.count("*").alias("n_docs"))
            ov = counts.filter(F.col("n_docs") > cfg.emb_bucket_cap)
            self._record_overflow("emb_overflow_buckets", ov)
            kept = all_p.join(
                ov.select("band", "bucket"), ["band", "bucket"], "left_anti"
            ).repartition(cfg.shuffle_partitions, "band", "bucket")
            pairs = incremental_posting_pairs(
                kept.filter("_new"), kept, ["band", "bucket"]
            ).dropDuplicates(["doc_a", "doc_b"])
            allv = (
                base_emb.unionByName(new_emb) if base_emb is not None else new_emb
            )
            va = allv.select(F.col("doc_id").alias("doc_a"), F.col("embedding").alias("_va"))
            vb = allv.select(F.col("doc_id").alias("doc_b"), F.col("embedding").alias("_vb"))
            return (
                pairs.join(va, "doc_a")
                .join(vb, "doc_b")
                .withColumn("cosine", F.round(cosine_similarity_col("_va", "_vb"), 6))
                .filter(F.col("cosine") >= cfg.emb_threshold)
                .select(
                    "doc_a",
                    "doc_b",
                    F.lit("embedding").alias("method"),
                    F.lit(None).cast("double").alias("jaccard"),
                    F.lit(True).alias("passed"),
                    "cosine",
                )
            )

        df = self._stage("embedding_pairs", build)
        for o in self._overflow_cache:
            o.unpersist()
        self._overflow_cache.clear()
        return df

    def merge_verified(self, ver: DataFrame, emb_pairs: DataFrame) -> DataFrame:
        """Union text-verified and embedding edges into one pair table.
        One pair found by several modalities keeps the strongest
        PASSED method (deterministic: method ranks are distinct and
        failed rows rank below every passed row), the max jaccard, and
        the cosine where the embedding branch saw it."""

        def build():
            base = ver.select(
                "doc_a", "doc_b", "method", "jaccard", "passed",
                F.lit(None).cast("double").alias("cosine"),
            )
            strength = method_rank_col() + F.when(F.col("passed"), 100).otherwise(0)
            return (
                base.unionByName(
                    emb_pairs.select(
                        "doc_a", "doc_b", "method", "jaccard", "passed", "cosine"
                    )
                )
                .groupBy("doc_a", "doc_b")
                .agg(
                    F.max_by("method", strength).alias("method"),
                    F.max("jaccard").alias("jaccard"),
                    F.max("passed").alias("passed"),
                    F.max("cosine").alias("cosine"),
                )
                .withColumn("score", pair_score(hamming_col=None))
            )

        return self._stage("verified_all", build)

    # -- incremental path ---------------------------------------------
    def _incremental_candidates(
        self,
        new_docs: DataFrame,
        new_sigs: DataFrame,
        base_sigs: DataFrame,
        link_edges: DataFrame,
    ) -> DataFrame:
        """Candidate pairs touching >= 1 increment doc — the one-sided
        form of :meth:`candidates`. Posting tables (LSH buckets, SimHash
        chunks, anchors) combine base+increment so caps see the TRUE
        bucket sizes (identical overflow behavior to a full recompute),
        but the pair join probes only increment postings — old-vs-old
        pairs are never generated (their connectivity already lives in
        the base component assignment)."""
        cfg = self.cfg

        def build():
            exact = exact_dup_edges(new_docs).select("doc_a", "doc_b", "method").unionByName(
                link_edges
            )
            non_new = new_sigs.filter(F.col("n_shingles") > 0)
            non_old = base_sigs.filter(F.col("n_shingles") > 0)

            def bands_of(sigs):
                return sigs.select("doc_id", F.posexplode("bands").alias("band", "bucket_hash"))

            all_b = tag_postings(bands_of(non_old), bands_of(non_new))
            counts = all_b.groupBy("band", "bucket_hash").agg(F.count("*").alias("n_docs"))
            lsh_ov = counts.filter(F.col("n_docs") > cfg.bucket_cap)
            self._record_overflow("lsh_overflow_buckets", lsh_ov)
            kept_all = all_b.join(
                lsh_ov.select("band", "bucket_hash"), ["band", "bucket_hash"], "left_anti"
            ).repartition(cfg.shuffle_partitions, "band", "bucket_hash")
            lsh_pairs = incremental_posting_pairs(
                kept_all.filter("_new"), kept_all, ["band", "bucket_hash"]
            ).withColumn("method", F.lit("lsh"))
            branches = [exact, lsh_pairs]
            if self.enable_simhash:
                all_s = tag_postings(
                    simhash_chunks(non_old.select("doc_id", "simhash"), cfg),
                    simhash_chunks(non_new.select("doc_id", "simhash"), cfg),
                )
                s_counts = all_s.groupBy("chunk_id", "chunk_val").agg(
                    F.count("*").alias("n_docs")
                )
                sim_ov = s_counts.filter(F.col("n_docs") > cfg.bucket_cap)
                self._record_overflow("simhash_overflow_chunks", sim_ov)
                kept_s = all_s.join(
                    sim_ov.select("chunk_id", "chunk_val"), ["chunk_id", "chunk_val"], "left_anti"
                ).repartition(cfg.shuffle_partitions, "chunk_id", "chunk_val")
                sim_pairs = (
                    incremental_posting_pairs(
                        kept_s.filter("_new"), kept_s, ["chunk_id", "chunk_val"],
                        extra_cols=["simhash"],
                    )
                    .filter(F.expr(f"bit_count(simhash_a ^ simhash_b) <= {cfg.hamming_d}"))
                    .select("doc_a", "doc_b")
                    .withColumn("method", F.lit("simhash"))
                )
                branches.append(sim_pairs)
            overflow_docs = None
            if self.enable_substring:
                def anchors_of(sigs):
                    return sigs.select("doc_id", F.explode("anchors").alias("anchor"))

                all_a = tag_postings(anchors_of(non_old), anchors_of(non_new))
                a_counts = all_a.groupBy("anchor").agg(F.count("*").alias("n_docs"))
                anc_ov = a_counts.filter(F.col("n_docs") > cfg.anchor_cap)
                anc_ov = self._record_overflow("anchor_overflow", anc_ov)
                kept_a = all_a.join(
                    anc_ov.select("anchor"), "anchor", "left_anti"
                ).repartition(cfg.shuffle_partitions, "anchor")
                anc_pairs = incremental_posting_pairs(
                    kept_a.filter("_new"), kept_a, ["anchor"]
                )
                if cfg.min_shared_anchors > 1:
                    anc_pairs = (
                        anc_pairs.groupBy("doc_a", "doc_b")
                        .agg(F.count("*").alias("_n_shared"))
                        .filter(F.col("_n_shared") >= cfg.min_shared_anchors)
                        .drop("_n_shared")
                    )
                branches.append(anc_pairs.withColumn("method", F.lit("anchor")))
                overflow_docs = (
                    all_a.join(anc_ov.select("anchor"), "anchor", "left_semi")
                    .select("doc_id")
                    .distinct()
                    .withColumn("_anchor_ov", F.lit(True))
                )
            return self._strongest_with_overflow(branches, overflow_docs)

        df = self._stage("candidate_pairs", build)
        for o in self._overflow_cache:
            o.unpersist()
        self._overflow_cache.clear()
        return df

    def run_incremental(
        self,
        new_pages: DataFrame,
        base: dict[str, DataFrame],
        batch_id: str | None = None,
        new_embeddings: DataFrame | None = None,
        base_embeddings: DataFrame | None = None,
    ) -> dict[str, DataFrame]:
        """Fold a NEW batch of pages into an already-deduplicated corpus
        — O(|increment| x touched-postings), never old-vs-old.

        ``base`` is the dict a previous :meth:`run` (or
        ``run_incremental``) returned — ``docs``, ``signatures``,
        ``components`` are used. Page doc identity is xxhash64(url), so
        increment urls must be new urls (re-crawls of an existing url
        are an upsert, out of scope here).

        The stages (namespaced ``inc_*`` in the checkpoint store):
        1. ``inc_docs`` — extract + content_sha for the increment only.
        2. Byte-identical link: increment shas join the base exact-group
           reps (ONE columnar scan of base docs, increment broadcast);
           linked docs produce exact edges and are NOT re-signed.
        3. ``inc_signatures`` — fused kernel over genuinely-new distinct
           content only.
        4. ``inc_candidate_pairs`` — one-sided posting joins against
           base+increment postings; caps see true combined bucket sizes.
        5. ``inc_verified_pairs`` — the unchanged :meth:`verified` stage
           (size-ratio prune, exact Jaccard, substring LCS routing) over
           the union signature/doc tables (join-back hydrates only pair
           participants, so the base corpus is scanned, not verified).
        6. ``inc_components`` — :func:`merge_components` contraction:
           CC runs on a graph of <= 2·|new edges| nodes; the merge map
           broadcasts over the standing assignment.

        Identity: equals a from-scratch :meth:`run` over old ∪ new docs
        (asserted end-to-end in tests/test_incremental.py), except that
        pairs whose bucket overflows only in the combined corpus keep
        their base-run edges (a fresh run would have dropped them —
        incremental is recall->=-full-run under caps, never below).

        ``new_embeddings``/``base_embeddings``: the embedding modality's
        one-sided analog (:meth:`_incremental_embedding_pairs`) — when
        the base ran with embeddings, pass both and the fold-in result
        equals a fresh :meth:`run` over old ∪ new with the combined
        embedding table (same derived banding, same caps-see-combined
        semantics; pytest-pinned in tests/test_incremental.py).

        ``batch_id`` namespaces this increment's checkpoint stages
        (``inc_<batch_id>_*``). REQUIRED for repeated increments against
        one checkpoint store: without it a second batch would find the
        first batch's completed ``inc_*`` manifests (same config hash)
        and wrongly reuse them. Give each batch a stable id (stable =
        the same killed batch can resume; new batch = new id).
        """
        base_docs, base_sigs, base_comps = base["docs"], base["signatures"], base["components"]
        prev_ns = self._stage_ns
        self._stage_ns = "inc_" if batch_id is None else f"inc_{batch_id}_"
        try:
            new_docs = self.prepare_docs(new_pages)
            # byte-identity link: restrict the base to rows whose sha
            # appears in the increment (broadcast hash join — ONE
            # columnar scan of base docs, NO shuffle of the base), then
            # group only those tiny matches for the per-sha base rep
            # (min doc_id — identical to exact_groups restricted to the
            # matching shas, without exact_groups' full-corpus shuffle)
            new_sha = new_docs.select("doc_id", "content_sha")
            base_matches = base_docs.select("doc_id", "content_sha").join(
                F.broadcast(new_sha.select("content_sha").distinct()), "content_sha"
            )
            base_reps = base_matches.groupBy("content_sha").agg(
                F.min("doc_id").alias("rep_doc")
            )
            linked = (
                base_reps.join(F.broadcast(new_sha), "content_sha")
                .select("rep_doc", "doc_id")
                .persist()
            )
            # doc ids are xxhash64(url), so the base rep is NOT always
            # the smaller id — canonicalize to keep the doc_a < doc_b
            # invariant every other candidate branch maintains
            link_edges = linked.select(
                F.least("rep_doc", "doc_id").alias("doc_a"),
                F.greatest("rep_doc", "doc_id").alias("doc_b"),
                F.lit("exact").alias("method"),
            )

            def build_sigs():
                reps = distinct_content(new_docs).join(
                    F.broadcast(linked.select("doc_id")), "doc_id", "left_anti"
                )
                sig = make_signature_udf(self.cfg)
                return (
                    reps.select("doc_id", sig(F.col("text")).alias("sig"))
                    .select("doc_id", "sig.bands", "sig.simhash", "sig.n_shingles", "sig.anchors")
                    .withColumn("config_hash", F.lit(self.cfg.config_hash()))
                )

            new_sigs = self._stage("signatures", build_sigs)
            cands = self._incremental_candidates(new_docs, new_sigs, base_sigs, link_edges)
            sigs_all = base_sigs.unionByName(new_sigs)
            common = [c for c in base_docs.columns if c in new_docs.columns]
            docs_all = base_docs.select(common).unionByName(new_docs.select(common))
            ver = self.verified(cands, sigs_all, docs_all)
            if new_embeddings is not None:
                emb_edges = self._incremental_embedding_pairs(
                    base_embeddings, new_embeddings
                )
                ver = self.merge_verified(ver, emb_edges)

            # merge runs OUTSIDE the stage builder so the merge map is
            # in hand for summary maintenance; the CC it runs is over
            # the tiny contracted graph (the whole point), so the eager
            # recompute on a resumed run is cheap
            edges = ver.filter("passed").select(
                F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
            )
            merged, comp_map = merge_components(
                base_comps,
                edges,
                new_docs,
                max_iterations=self.cfg.max_cc_iterations,
                salt_buckets=self.cfg.cc_salt_buckets,
                return_map=True,
            )
            comps = self._stage("components", lambda: merged)
            linked.unpersist()
            # cluster summary: incrementally maintained when the base
            # provides its standing summary (untouched rows stream
            # through; only merge-touched + new components aggregate) —
            # full recompute otherwise
            new_assign = comps.join(
                F.broadcast(new_docs.select("doc_id")), "doc_id", "left_semi"
            )
            if "cluster_summary" in base:
                summary = merge_cluster_summary(
                    base["cluster_summary"], comp_map, new_assign
                )
            else:
                summary = cluster_summary(comps)
            return {
                "docs": docs_all,
                "signatures": sigs_all,
                "candidate_pairs": cands,
                "verified_pairs": ver,
                "components": comps,
                "representatives": select_representatives(comps),
                "cluster_summary": summary,
            }
        finally:
            self._stage_ns = prev_ns
