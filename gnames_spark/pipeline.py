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
from gnames_spark.operators.exact import distinct_content, exact_dup_edges, with_content_sha
from gnames_spark.operators.lsh import candidate_pairs as lsh_bucket_pairs
from gnames_spark.operators.lsh import capped_buckets
from gnames_spark.operators.representatives import cluster_summary, select_representatives
from gnames_spark.operators.scoring import pair_score
from gnames_spark.operators.simhash_join import simhash_candidates
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

    # -- stage helper ------------------------------------------------
    def _stage(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        if self.io is not None:
            df, res = self.io.write_or_reuse(self.spark, name, build, partition_by)
            self.metrics.record(name, res.rows, res.secs, reused=res.reused)
            return df
        # no checkpoint store: persist + materialize so downstream stages
        # (each stage is consumed 2-4x) never recompute upstream work —
        # the in-memory analog of the checkpoint write
        import time as _time

        t0 = _time.monotonic()
        df = build().persist()
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
        self.metrics.record(name, int(row["n"]), 0.0, dropped_docs=int(row["docs"]))
        return overflow

    # -- stages --------------------------------------------------------
    def prepare_docs(self, pages: DataFrame) -> DataFrame:
        """pages(url, html[, text]) → docs(doc_id, url, text, lang,
        content_sha, n_chars). html is extracted then DROPPED."""
        cfg = self.cfg

        def build():
            df = pages
            if "html" in df.columns:
                df = df.withColumn("text", extract_text("html")).drop("html")
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
            out = branches[0]
            for b in branches[1:]:
                out = out.unionByName(b)
            # keep strongest method per pair. anchor outranks lsh/simhash:
            # the verified stage routes Jaccard-failed anchor pairs into
            # the substring LCS check, so a pair co-detected by lsh must
            # not lose its anchor tag (a substring dup at J<tau would
            # silently skip LCS otherwise).
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

    def run(self, pages: DataFrame) -> dict[str, DataFrame]:
        docs = self.prepare_docs(pages)
        sigs = self.signatures(docs)
        cands = self.candidates(docs, sigs)
        ver = self.verified(cands, sigs, docs)
        comps = self.components(docs, ver)
        reps = select_representatives(comps)
        summary = cluster_summary(comps)
        return {
            "docs": docs,
            "signatures": sigs,
            "candidate_pairs": cands,
            "verified_pairs": ver,
            "components": comps,
            "representatives": reps,
            "cluster_summary": summary,
        }
