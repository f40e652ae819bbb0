"""Command-line driver mirroring the reference's program surface.

The reference exposes four driver classes launched as
``hadoop jar <jar> <job.name> <input> [<intermediate>] <output>``
(reference ``Makefile:8,42-43,90,95``). Here the same four programs run as

    python -m twitter_social_triangle_mapreduce_spark <program> <input-dir> <output-dir>

with ``<input-dir>`` containing ``edges.csv``-format files
(``followerId,followeeId`` lines) and the scalar answer printed to stdout
exactly where the reference prints its counter (SURVEY.md §3):

- ``social_triangle_rs``  — triangle count, repartition join, MAX=50000 strict
- ``triangle_replicated`` — triangle count, broadcast join, MAX=40000 non-strict
- ``exact_cardinality``   — path-2 count, no filter; per-node table written
- ``approx_cardinality``  — path-2 count, MAX=7812500 strict; per-node table

``--max-id`` overrides the program's reference constant. Per-node outputs
are written tab-separated (the reference's ``TextOutputFormat`` with
``\\t``); triangle programs write no rows (the reference's Job-2 reducer
emits none — ``SocialTriangle_RS.java`` ``ClosedTriangle`` has no output
records), only the printed scalar.

Beyond the reference surface: ``sql`` (ad-hoc SQL over the registered
views), ``explain`` (formatted physical plan of any registered query),
``query`` (run any registered query), ``prepare_corpus`` (the
training-data capstone: curate → near-dup canonical → decontaminate →
pack → shards, writing ``<out>/shards`` + ``<out>/audit``), and
``maintain`` (round 9: the streaming-store maintenance operations as a
program — ``<snapshot-dir> <action>`` with actions
``compact_semantic_embs`` / ``compact_cluster_bands`` /
``compact_passage_windows`` / ``compact_passage_cuts`` /
``compact_pack_rows`` / ``compact_ann_index`` / ``reband_semantic``
(``--bits`` optional, else corpus-derived) / ``ann_scale_headroom`` /
``rebuild_ann_index`` (round 10, ``--source`` required, ``--scale``
optional — the executable response to the drift audit: re-quantize the
whole corpus from the float source onto a corpus-sized grid) /
``status`` (round 10: the read-only operational report — lock state,
versions, per-store live batches vs committed generations, cleanup
backlog, width/scale pins, drift audit — so an operator can decide
WHICH maintenance to run without poking at marker files) / ``check``
(read-only fsck: classifies store state against the read path's own
invariants — ``error`` = readers will misbehave (live generation
without its data dir or ledger, unreadable scale/bits pin),
``warning`` = degraded but serving, ``ok`` = verified; exits 1 on any
error so cron can alert; ``--deep`` adds a duplicate-row scan) /
``clone`` (``--dest`` required: marker-cut-consistent physical copy
of the whole snapshot into an empty directory — data first, markers
last, fsck-verified — the backup/DR/promotion primitive; holds the
source maintenance lock, so the feeding stream keeps running but
compactors wait) / ``gc`` (explicit reclamation of the benign
leftovers ``status`` counts — folded dirs, stale generation markers,
crashed holders' staging — without waiting for the next compaction;
readers see no change) — so
compaction, re-banding, the quantizer-drift audit, and the drift-cure
rebuild run from cron or a shell the way they would in production, not
only from Python).

Concurrency guarantee (round 10): maintenance operations take a
per-snapshot single-writer lock (an atomic ``create(overwrite=False)``
CAS on ``<snapshot>/markers/_MAINTENANCE_LOCK``). Overlapping
``maintain`` invocations on the SAME snapshot — e.g. a cron schedule
that fires before the previous run finished — fail loudly with
``ConcurrentMaintenanceError`` and leave the store untouched; they
never corrupt it. A lock left by a crashed run self-expires after
``streaming.MAINTENANCE_LEASE_SECONDS`` (6 h) and is reclaimed
automatically. Retry rejected runs after the holder finishes. The
read-only actions (``ann_scale_headroom``, ``status``, ``check``)
take no lock — a status or integrity probe must never block, or be
blocked by, a running compactor.

The lock serializes MAINTENANCE against MAINTENANCE; it does not stop
the owning STREAM from folding (folds are the store's normal writers
and take no lock). Compactors tolerate that by never touching the
newest stream batch; ``rebuild_ann_index`` is stricter — PAUSE the
stream first, because a fold that commits mid-rebuild carries
old-grid vectors the rebuild cannot cure (the pre-flip fence aborts
loudly when it sees one committed, but a fold still in flight at flip
time can only be excluded by pausing).
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from .operators import graph
from .session import get_spark
from .sources.io import read_edges_csv, register_views, write_tsv

#: the reference programs' hard-coded cutoffs (SURVEY.md §2.7.5)
REFERENCE_MAX = {
    "social_triangle_rs": 50000,
    "triangle_replicated": 40000,
    "exact_cardinality": None,
    "approx_cardinality": 7812500,
}

PROGRAMS = tuple(REFERENCE_MAX)


def run_program(
    spark,
    program: str,
    input_dir: str,
    output_dir: str,
    max_id=None,
    intermediate_dir: str | None = None,
) -> int:
    """Execute one reference program; returns the scalar answer."""
    if max_id is None:
        max_id = REFERENCE_MAX[program]
    edges = read_edges_csv(spark, f"{input_dir}/*.csv")

    if program == "social_triangle_rs":
        if intermediate_dir is not None:
            # the reference's Job 1 materializes the X,Y,Z path relation to
            # HDFS (SocialTriangle_RS.java:98,212-213); optional here —
            # lineage replaces the file handoff unless a user wants the
            # intermediate
            write_tsv(
                graph.path2(edges, max_id=max_id, strict=True),
                intermediate_dir,
            )
        n = graph.triangle_count(edges, max_id=max_id, strategy="shuffle").collect()[0][0]
        # reference writes only empty part files for the triangle jobs
        spark.createDataFrame([], "value string").write.mode("overwrite").text(output_dir)
        print(f"COUNT:{n}")
        return n
    if program == "triangle_replicated":
        n = graph.triangle_count(edges, max_id=max_id, strategy="broadcast").collect()[0][0]
        spark.createDataFrame([], "value string").write.mode("overwrite").text(output_dir)
        print(f"TOTAL COUNT: {n}")
        return n
    if program in ("exact_cardinality", "approx_cardinality"):
        strict = True
        per_node = graph.path2_cardinality_per_node(
            edges, max_id=max_id, strict=strict
        )
        # the reference writes `node \t m·n` (ExactCardinality.java:79-81)
        write_tsv(per_node.select("node", "paths"), output_dir)
        n = per_node.agg(
            F.coalesce(F.sum("paths"), F.lit(0)).cast("long")
        ).collect()[0][0]
        print(f"COUNT:{n}")
        return n
    raise ValueError(f"unknown program {program!r}")


def run_explain(spark, sf_dir: str, query_name: str) -> str:
    """``explain`` subcommand: print the formatted physical plan of any
    registered query — the operability hook for verifying pushdown /
    join strategy / shuffle shape on a live session."""
    from . import registry

    queries = registry.all_queries(include_extra=True)
    if query_name not in queries:
        raise SystemExit(
            f"unknown query {query_name!r}; one of: {', '.join(sorted(queries))}"
        )
    from .plans.explain import plan_of

    plan = plan_of(queries[query_name](spark, sf_dir))
    print(plan)
    return plan


def run_query(
    spark, sf_dir: str, query_name: str, out_dir: str | None = None
) -> None:
    """``query`` subcommand: run ANY registered query (graph core +
    every extension) against a testdata sf dir — parquet out when a
    destination is given, table print otherwise. The reference exposes
    four fixed programs; here the full registry is the program surface."""
    from . import registry

    queries = registry.all_queries(include_extra=True)
    if query_name not in queries:
        raise SystemExit(
            f"unknown query {query_name!r}; one of: {', '.join(sorted(queries))}"
        )
    df = queries[query_name](spark, sf_dir)
    if out_dir:
        df.write.mode("overwrite").parquet(out_dir)
    else:
        df.show(50, truncate=False)


def run_sql(spark, sf_dir: str, query: str, limit: int = 50) -> None:
    """``sql`` subcommand: register the testdata tables + ``edges`` as
    views and run one ad-hoc SQL statement — the interactive query surface
    the reference never had."""
    register_views(spark, sf_dir)
    spark.sql(query).show(limit, truncate=False)


def run_prepare_corpus(
    spark,
    sf_dir: str,
    out_dir: str,
    eval_mod: int = 17,
    shuffle_seed: str | None = None,
    semantic: bool = False,
    diversity_per_cell: int | None = None,
    train_bpe: int | None = None,
) -> dict[str, int]:
    """``prepare_corpus`` subcommand: the training-data capstone as a
    user-facing program — curate → near-dup canonical → decontaminate →
    pack → shards in one run. Writes ``<out>/shards`` (hive-partitioned
    training shards in tape order) and ``<out>/audit`` (the per-document
    verdict relation), prints the verdict histogram, and returns it.
    ``eval_mod`` selects the held-out decontamination probe
    (doc_id % eval_mod == 0), matching the bench/driver convention;
    values < 1 would silently disable decontamination (NULL modulo) or
    die mid-run under ANSI — rejected up front."""
    from .operators.corpus import prepare_training_corpus
    from .sources.io import load_table

    if eval_mod < 1:
        raise SystemExit(f"--eval-mod must be >= 1, got {eval_mod}")

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(f"doc_id % {eval_mod} = 0")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        if (semantic or diversity_per_cell is not None)
        else None
    )
    merges = None
    if train_bpe is not None:
        from .operators.bpe import save_merges, train_bpe_merges

        # train the tokenizer on the input corpus, publish the table
        # next to the shards, and pack by model-token counts
        merges = train_bpe_merges(docs, train_bpe)
        save_merges(spark, merges, f"{out_dir}/bpe_merges")
    audit = prepare_training_corpus(
        docs,
        ev,
        f"{out_dir}/shards",
        shuffle_seed=shuffle_seed,
        embeddings=emb,
        diversity_per_cell=diversity_per_cell,
        bpe_merges=merges,
    )
    audit.write.mode("overwrite").parquet(f"{out_dir}/audit")
    hist = {
        r["verdict"]: r["n"]
        for r in audit.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    audit.unpersist()
    for verdict in sorted(hist):
        print(f"{verdict}\t{hist[verdict]}")
    return hist


#: action names the ``maintain`` subcommand dispatches (compact_* by
#: getattr on the streaming package; the last two have custom arms)
MAINTAIN_ACTIONS = (
    "compact_semantic_embs",
    "compact_cluster_bands",
    "compact_passage_windows",
    "compact_passage_cuts",
    "compact_pack_rows",
    "compact_ann_index",
    "reband_semantic",
    "ann_scale_headroom",
    "rebuild_ann_index",
    "status",
    "check",
    "clone",
    "gc",
)


def run_maintain(
    spark,
    snapshot_dir: str,
    action: str,
    bits: int | None = None,
    target_file_mb: int = 256,
    min_sim_e4: int | None = None,
    codebook: str | None = None,
    source: str | None = None,
    scale: float | None = None,
    deep: bool = False,
    dest: str | None = None,
    sync: bool = False,
    parallel: bool = False,
    as_json: bool = False,
) -> None:
    """``maintain`` subcommand: run one streaming-store maintenance
    operation against a snapshot directory and print its outcome —
    the operational surface for the between-folds jobs (compaction,
    re-band migration, quantizer-drift audit). Compactors print the
    new generation id or ``NOOP``; ``reband_semantic`` prints the new
    width or ``NOOP``; ``ann_scale_headroom`` prints its one audit
    row tab-separated; ``status`` prints the read-only operational
    report (one ``component  metric  value  detail`` line per
    observed fact, integral values un-decimaled). The re-band derives the embedding width from
    the store itself, but the OTHER clustering knobs have no stored
    contract and must match what the folds use: pass ``--codebook``
    (a ``save_codebook`` parquet path — the trained quantizer the
    stream folds with; omitting it on a codebook-pinned store would
    recompute with the stand-in quantizer and silently miss
    collisions) and ``--min-sim-e4`` for a non-default cosine
    threshold. Knobs beyond these (bands, k_cells, nprobe) are
    Python-API-only — call ``reband_semantic_store`` directly."""
    from . import streaming as S

    if action == "reband_semantic":
        kwargs = {} if min_sim_e4 is None else {"min_sim_e4": min_sim_e4}
        if codebook is not None:
            from .operators.similarity import load_codebook

            kwargs["centroids"] = load_codebook(spark, codebook)
        got = S.reband_semantic_store(
            spark, snapshot_dir, bits=bits, **kwargs
        )
        print(f"REBANDED_BITS:\t{got}" if got is not None else "NOOP")
        return
    if action == "rebuild_ann_index":
        if source is None:
            raise SystemExit(
                "maintain rebuild_ann_index requires --source: the"
                " parquet path of the FULL float embeddings relation"
                " (vec_id, embedding) — the quantized store discarded"
                " its floats, so the cure must come from the source"
                " of truth"
            )
        got = S.rebuild_ann_index(
            spark,
            snapshot_dir,
            spark.read.parquet(source),
            scale=scale,
            target_file_mb=target_file_mb,
        )
        print(f"REBUILT_SCALE:\t{got}")
        return
    if action == "gc":
        got = S.maintenance_gc(spark, snapshot_dir)
        print(
            "GC:\t"
            + "\t".join(f"{k}={v}" for k, v in sorted(got.items()))
        )
        return
    if action == "clone":
        if dest is None:
            raise SystemExit(
                "maintain clone requires --dest: the (empty) directory"
                " to clone the snapshot into"
            )
        got = S.clone_snapshot(
            spark, snapshot_dir, dest, sync=sync, parallel=parallel
        )
        print(
            f"CLONED:\t{got['files']} files\t{got['bytes']} bytes"
            f"\t{got['markers']} markers"
            + (f"\tpruned={','.join(got['skipped'])}" if got["skipped"] else "")
        )
        return
    if action == "check":
        import json as _json

        findings = S.maintenance_check(
            spark, snapshot_dir, deep=deep
        ).collect()
        for r in findings:
            if as_json:
                print(_json.dumps(r.asDict()))
            else:
                print(
                    f"{r['severity']}\t{r['component']}\t{r['finding']}"
                    f"\t{r['detail'] or ''}"
                )
        n_err = sum(1 for r in findings if r["severity"] == "error")
        if as_json:
            print(_json.dumps({"check": "ok" if not n_err else "errors",
                               "errors": n_err}))
        else:
            print(f"CHECK:\t{'OK' if n_err == 0 else f'ERRORS={n_err}'}")
        if n_err:
            raise SystemExit(1)
        return
    if action == "status":
        import json as _json

        for r in S.maintenance_status(spark, snapshot_dir).collect():
            if as_json:
                d = r.asDict()
                v = d["value"]
                if v is not None and float(v).is_integer():
                    d["value"] = int(v)
                print(_json.dumps(d))
                continue
            v = r["value"]
            v_str = (
                ""
                if v is None
                else str(int(v)) if float(v).is_integer() else f"{v:.6g}"
            )
            print(
                f"{r['component']}\t{r['metric']}\t{v_str}"
                f"\t{r['detail'] or ''}"
            )
        return
    if action == "ann_scale_headroom":
        row = S.ann_scale_headroom(spark, snapshot_dir).collect()[0]
        for k in (
            "pinned_scale",
            "corpus_max_abs",
            "headroom_ratio",
            "n_batches",
            "n_clamped_batches",
        ):
            print(f"{k}\t{row[k]}")
        return
    fn = getattr(S, action)
    gen = fn(spark, snapshot_dir, target_file_mb=target_file_mb)
    print(f"GENERATION:\t{gen}" if gen is not None else "NOOP")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        prog="twitter_social_triangle_mapreduce_spark",
        description="PySpark-native equivalents of the reference MapReduce programs",
    )
    p.add_argument(
        "program",
        choices=(
            *PROGRAMS,
            "sql",
            "explain",
            "query",
            "prepare_corpus",
            "maintain",
        ),
    )
    p.add_argument(
        "input_dir",
        help="programs: directory of followerId,followeeId CSV files; "
        "sql: a testdata sf dir to register as views",
    )
    p.add_argument(
        "output_dir",
        help="programs: result directory (TSV / empty marker); "
        "sql: the SQL text to run",
    )
    p.add_argument(
        "--max-id",
        type=int,
        default=None,
        help="override the program's reference id cutoff",
    )
    p.add_argument(
        "--intermediate",
        default=None,
        help="social_triangle_rs only: also write the Job-1 X,Y,Z path "
        "relation here (the reference's 3-arg form)",
    )
    p.add_argument(
        "--eval-mod",
        type=int,
        default=17,
        help="prepare_corpus only: held-out decontamination probe is "
        "doc_id %% eval_mod == 0",
    )
    p.add_argument(
        "--shuffle-seed",
        default=None,
        help="prepare_corpus only: deterministic tape shuffle of the "
        "kept corpus before packing (epoch reshuffle = new seed)",
    )
    p.add_argument(
        "--semantic",
        action="store_true",
        help="prepare_corpus only: join the embeddings table and drop "
        "embedding-cosine duplicates (semantic_dup)",
    )
    p.add_argument(
        "--diversity-per-cell",
        type=int,
        default=None,
        help="prepare_corpus only: cap each semantic cell at N kept "
        "docs (diversity_cut; implies --semantic)",
    )
    p.add_argument(
        "--train-bpe",
        type=int,
        default=None,
        help="prepare_corpus only: train N BPE merges on the corpus, "
        "publish them next to the shards, and write TOKENIZED shards "
        "packed by model-token counts",
    )
    p.add_argument(
        "--bits",
        type=int,
        default=None,
        help="maintain reband_semantic only: explicit target width "
        "(default: lsh_bits_for of the store's current corpus count)",
    )
    p.add_argument(
        "--target-file-mb",
        type=int,
        default=256,
        help="maintain compact_* only: compacted generation file sizing",
    )
    p.add_argument(
        "--min-sim-e4",
        type=int,
        default=None,
        help="maintain reband_semantic only: the stream's cosine "
        "threshold (the recompute must use the folds' knobs)",
    )
    p.add_argument(
        "--codebook",
        default=None,
        help="maintain reband_semantic only: save_codebook parquet "
        "path — REQUIRED when the stream folds with a trained "
        "quantizer (a stand-in recompute silently misses collisions)",
    )
    p.add_argument(
        "--source",
        default=None,
        help="maintain rebuild_ann_index only (required): parquet path "
        "of the FULL float embeddings relation (vec_id, embedding) to "
        "re-quantize from",
    )
    p.add_argument(
        "--scale",
        type=float,
        default=None,
        help="maintain rebuild_ann_index only: explicit int8 grid "
        "scale (default: the source corpus max-abs)",
    )
    p.add_argument(
        "--dest",
        default=None,
        help="maintain clone only (required): empty directory to clone "
        "the snapshot into (marker-cut consistent, fsck-verified)",
    )
    p.add_argument(
        "--json",
        dest="as_json",
        action="store_true",
        help="maintain status/check only: one JSON object per report "
        "row (monitoring-integration format) instead of tab columns",
    )
    p.add_argument(
        "--sync",
        action="store_true",
        help="maintain clone only: refresh an existing clone "
        "incrementally (skip already-present files, mirror pin dirs, "
        "add new markers) instead of requiring an empty --dest",
    )
    p.add_argument(
        "--parallel",
        action="store_true",
        help="maintain clone only: fan the data pass out over the "
        "cluster (pyarrow.fs streams per task) instead of the "
        "driver-side serial copy — the 100 TB arm",
    )
    p.add_argument(
        "--deep",
        action="store_true",
        help="maintain check only: also scan each store's live union "
        "for duplicated full rows (one Spark aggregation per store) — "
        "the interleaved-concurrent-writes corruption signature",
    )
    args = p.parse_args(argv)
    spark = get_spark(app_name=f"tstm-{args.program}")
    spark.sparkContext.setLogLevel("WARN")
    if args.program == "sql":
        # input_dir = testdata dir, output_dir = the SQL text
        run_sql(spark, args.input_dir, args.output_dir)
        return
    if args.program == "explain":
        # input_dir = testdata dir, output_dir = the registered query name
        run_explain(spark, args.input_dir, args.output_dir)
        return
    if args.program == "query":
        # input_dir = testdata dir, output_dir = "<name>[:<parquet_out>]"
        name, _, dest = args.output_dir.partition(":")
        run_query(spark, args.input_dir, name, dest or None)
        return
    if args.program == "maintain":
        # input_dir = snapshot dir, output_dir = the action name
        if args.output_dir not in MAINTAIN_ACTIONS:
            raise SystemExit(
                f"unknown maintain action {args.output_dir!r};"
                f" one of {', '.join(MAINTAIN_ACTIONS)}"
            )
        run_maintain(
            spark,
            args.input_dir,
            args.output_dir,
            bits=args.bits,
            target_file_mb=args.target_file_mb,
            min_sim_e4=args.min_sim_e4,
            codebook=args.codebook,
            source=args.source,
            scale=args.scale,
            deep=args.deep,
            dest=args.dest,
            sync=args.sync,
            parallel=args.parallel,
            as_json=args.as_json,
        )
        return
    if args.program == "prepare_corpus":
        # input_dir = testdata dir, output_dir = shards+audit destination
        run_prepare_corpus(
            spark,
            args.input_dir,
            args.output_dir,
            args.eval_mod,
            shuffle_seed=args.shuffle_seed,
            semantic=args.semantic,
            diversity_per_cell=args.diversity_per_cell,
            train_bpe=args.train_bpe,
        )
        return
    run_program(
        spark,
        args.program,
        args.input_dir,
        args.output_dir,
        args.max_id,
        intermediate_dir=args.intermediate,
    )


if __name__ == "__main__":
    main()
