"""Connect-safe, conf-overridable join/partitioning strategy guards.

Two operators make plan-time physical decisions from session internals:
the ordered-triangle closing join probes Catalyst's optimized-plan size
estimate (``df._jdf`` — classic-only), and the shingle pipeline probes
the scan's split count (``df.rdd`` — classic-only). Neither internal
exists under Spark Connect, so every probe here is (1) gated on an
explicit capability check, (2) overridable through a documented conf,
and (3) degrades to the SCALE-SAFE arm — a shuffled hash join / a
no-op — never silently to an over-threshold broadcast or a corpus-wide
repartition. The fallback arms are pinned by tests
(tests/test_strategy.py) so "which arm runs when the probe is
unavailable" is a stated contract, not an accident.

Conf escape hatches (settable per session, read at plan time):

- ``spark.graft.join.buildSide`` = ``auto`` (default) | ``broadcast`` |
  ``shuffle_hash`` — global override for every size-guarded build side.
  Operators may pass a more specific key (e.g.
  ``spark.graft.ordered.closingStrategy``) which, when set, wins.
- ``spark.graft.spreadSmallInput`` = ``auto`` (default) | ``off`` |
  ``force`` — the few-splits pre-spread before CPU-heavy derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: global conf key for the size-guarded build-side decision
BUILD_SIDE_CONF = "spark.graft.join.buildSide"
#: conf key for the small-input spread decision
SPREAD_CONF = "spark.graft.spreadSmallInput"
#: conf key + default for the spread's size-aware target (optimization
#: round 12): the minimum estimated input bytes one spread partition
#: must carry for the repartition to be worth a task's fixed cost. A
#: derivation task that would receive less than this much source text
#: costs more in per-task setup (agg hash-map + shuffle-writer init —
#: measured ~0.1 s CPU per task on the reference sandbox) than the
#: derivation itself; spreading a 30 KB eval set across 32 slots burned
#: ~4 CPU-s to parallelize 0.07 s of work. The target partition count
#: becomes min(defaultParallelism, est_bytes // minBytesPerTask) — at
#: corpus scale the estimate saturates the parallelism term and the
#: behavior is unchanged.
SPREAD_MIN_BYTES_CONF = "spark.graft.spreadSmallInput.minBytesPerTask"
SPREAD_MIN_BYTES_DEFAULT = "48k"
#: conf key + default for the compressed→decompressed correction applied
#: to the size estimate before dividing by minBytesPerTask (round 13,
#: r12 ADVICE): Catalyst's sizeInBytes for a parquet scan is ON-DISK
#: (compressed) bytes (spark.sql.sources.fileCompressionFactor defaults
#: to 1.0), often several times below the decompressed text the
#: CPU-heavy derivation actually processes — so without the correction
#: the estimate is a LOWER bound for file scans and medium compressed
#: inputs under-spread. 3.0 is a conservative text-parquet ratio
#: (snappy/zstd text compresses ~3–5×); the (48k, 3.0) defaults are
#: jointly calibrated so est·3//48k == est//16k — byte-identical
#: behavior to the round-12-measured (16k compressed) rule, with both
#: knobs now in honest decompressed-bytes units. Callers on
#: incompressible inputs set 1.0; raising fileCompressionFactor
#: globally would instead distort every broadcast-threshold decision.
SPREAD_COMPRESSION_FACTOR_CONF = (
    "spark.graft.spreadSmallInput.compressionFactor"
)
SPREAD_COMPRESSION_FACTOR_DEFAULT = "3.0"


def parse_byte_conf(s: str) -> int:
    """Parse a Spark byte-string conf value ("67108864", "10m", "1.5gb",
    "-1" for disabled) into bytes; negative means disabled. Fractional
    values multiply BEFORE truncation ('1.5g' → 1610612736, not 2**30)."""
    s = s.strip().lower()
    for suf, mult in (
        ("tb", 2**40), ("gb", 2**30), ("mb", 2**20), ("kb", 2**10),
        ("t", 2**40), ("g", 2**30), ("m", 2**20), ("k", 2**10), ("b", 1),
    ):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(float(s))


def is_classic(df: DataFrame) -> bool:
    """True when ``df`` is a classic (JVM-local) DataFrame whose private
    plan internals (``_jdf``, ``.rdd``) exist. Spark Connect proxies live
    under ``pyspark.sql.connect`` and expose neither."""
    return not type(df).__module__.startswith("pyspark.sql.connect")


def _conf(df: DataFrame, key: str, default: str | None = None) -> str | None:
    try:
        return df.sparkSession.conf.get(key, default)
    except Exception:
        return default


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan ``sizeInBytes`` estimate, or ``None``
    when the session cannot expose it (Spark Connect, or any internals
    failure). Runs no job — plan-time statistics only. The estimate is an
    UPPER bound for post-aggregation relations (size propagates through
    aggregates un-reduced without CBO), so callers comparing it against a
    threshold err toward the non-broadcast arm."""
    if not is_classic(df):
        return None
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def scan_partition_count(df: DataFrame) -> int | None:
    """The physical partition count of ``df``'s current plan, or ``None``
    when unavailable (Spark Connect). Needs only plan resolution, not a
    job."""
    if not is_classic(df):
        return None
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def build_side_mode(
    side: DataFrame,
    conf_key: str | None = None,
    stats_of: DataFrame | None = None,
    scale: float = 1.0,
) -> str:
    """The decision behind ``shuffle_hash_unless_broadcastable``, exposed
    so operators can couple FURTHER plan choices to the same arm (the
    ordered triangle adds a semi-join reduction only on the shuffle arm):

    - ``"as_is"``   — Catalyst's own estimate fits the broadcast
      threshold; leave the side unhinted and the planner broadcasts.
    - ``"broadcast"`` / ``"shuffle_hash"`` — forced by conf, or (for
      shuffle_hash) the auto fallback when statistics are unavailable
      (Spark Connect), unparseable, or over-threshold.

    ``stats_of`` + ``scale`` (round 5): a build side containing a
    Generate (explode) gets an effectively unbounded Catalyst estimate
    — the optimizer cannot bound an explode's multiplier, so ~7e18
    lands every such side on the shuffle arm even for a one-row input.
    Derivation-heavy build sides instead pass their PRE-DERIVATION
    relation (whose scan statistics are real) as ``stats_of`` and a
    documented row-width expansion factor as ``scale``; the broadcast
    arm then fires iff ``estimate(stats_of) · scale`` fits the
    threshold. Callers must pick ``scale`` as an upper bound of the
    derived/source byte ratio so the guard keeps erring toward the
    memory-safe side."""
    mode = "auto"
    if conf_key:
        mode = _conf(side, conf_key, "auto") or "auto"
    if mode == "auto":
        mode = _conf(side, BUILD_SIDE_CONF, "auto") or "auto"
    if mode in ("broadcast", "shuffle_hash"):
        return mode
    try:
        thresh = parse_byte_conf(
            _conf(side, "spark.sql.autoBroadcastJoinThreshold", "10485760")
            or "10485760"
        )
    except Exception:
        thresh = -1
    est = plan_size_estimate(side if stats_of is None else stats_of)
    if est is not None and 0 < thresh and 0 <= est * scale <= thresh:
        return "as_is"
    return "shuffle_hash"


def shuffle_hash_unless_broadcastable(
    side: DataFrame,
    conf_key: str | None = None,
    stats_of: DataFrame | None = None,
    scale: float = 1.0,
) -> DataFrame:
    """Plan-time join-strategy guard for a build side whose keys are known
    unique (skew-free): return ``side`` unchanged when Catalyst's OWN size
    estimate already fits the broadcast threshold (the planner then picks
    a broadcast hash join — zero exchange on the big probe side),
    otherwise hint SHUFFLE_HASH so the non-broadcast fallback is a hash
    join that streams the probe side instead of a sort-merge join that
    would sort it.

    Decision order (see ``build_side_mode``):
    1. ``conf_key`` (operator-specific, e.g.
       ``spark.graft.ordered.closingStrategy``), when set;
    2. ``spark.graft.join.buildSide``, when set to a non-``auto`` value;
    3. ``auto``: probe plan statistics. Unavailable statistics (Spark
       Connect — ``plan_size_estimate`` returns None), an unparseable
       threshold, or a disabled threshold all take the SHUFFLE_HASH arm —
       the scale-safe direction (a missed broadcast costs one exchange; a
       wrong broadcast costs executor memory). This documented fallback
       is asserted by tests/test_strategy.py.

    ``stats_of``/``scale`` forward to ``build_side_mode`` — see there
    (explode-bearing build sides must supply real statistics). When
    ``stats_of`` is supplied, the ``as_is`` arm applies an EXPLICIT
    broadcast hint (round-6 ADVICE): the whole point of the substitute
    statistics is that the planner cannot bound the derived side's own
    estimate, so returning it unhinted would leave Catalyst re-deriving
    the unbounded number and never actually broadcasting — the two
    prior call sites handled this inconsistently; now the helper does
    it."""
    mode = build_side_mode(side, conf_key, stats_of=stats_of, scale=scale)
    if mode == "broadcast":
        return F.broadcast(side)
    if mode == "as_is":
        return F.broadcast(side) if stats_of is not None else side
    return side.hint("shuffle_hash")


def spread_small_input(df: DataFrame) -> DataFrame:
    """Raise map-side parallelism before CPU-heavy per-row derivation
    (shingling, multi-digest minhash folds) when the source provides far
    fewer splits than the cluster has slots — a sub-MB parquet file
    arrives as ONE partition and would hash single-threaded. No-op when
    the input is already parallel: at corpus scale the scan has plenty of
    splits and a round-robin repartition there would pointlessly shuffle
    the whole corpus. The shuffled bytes in the firing case are by
    construction small (few-splits input).

    ``spark.graft.spreadSmallInput``: ``off`` disables, ``force``
    repartitions unconditionally, ``auto`` (default) probes the split
    count — and is a documented NO-OP under Spark Connect
    (``scan_partition_count`` returns None), the safe arm: a
    Connect-backed cluster at real scale has many splits anyway. The
    ``force`` escape hatch is exactly the Connect remedy, so it must
    NOT depend on the classic-only ``sparkContext`` — it falls back to
    ``spark.sql.shuffle.partitions`` (readable over Connect) for the
    target when ``defaultParallelism`` is unavailable (review
    finding)."""
    mode = _conf(df, SPREAD_CONF, "auto") or "auto"
    if mode == "off":
        return df
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        target = None
    if mode == "force":
        if target is None:
            target = int(
                _conf(df, "spark.sql.shuffle.partitions", "200") or "200"
            )
        return df.repartition(target)
    if target is None:
        return df
    # size-aware target (optimization round 12): cap the spread width so
    # each partition carries at least SPREAD_MIN_BYTES_CONF of estimated
    # DECOMPRESSED input — a sub-threshold relation spreads to fewer
    # slots (or not at all) instead of paying ~0.1 s of fixed task setup
    # per near-empty partition. Estimate direction (round-13 ADVICE fix):
    # Catalyst does NOT reduce the estimate through filters without CBO
    # (errs toward spreading), but a parquet scan's sizeInBytes is
    # COMPRESSED on-disk bytes (errs toward under-spreading) — the
    # compressionFactor conf corrects the latter; see its doc above. An
    # unavailable estimate keeps the full target.
    try:
        min_bytes = parse_byte_conf(
            _conf(df, SPREAD_MIN_BYTES_CONF, SPREAD_MIN_BYTES_DEFAULT)
            or SPREAD_MIN_BYTES_DEFAULT
        )
    except Exception:
        min_bytes = parse_byte_conf(SPREAD_MIN_BYTES_DEFAULT)
    try:
        factor = float(
            _conf(
                df,
                SPREAD_COMPRESSION_FACTOR_CONF,
                SPREAD_COMPRESSION_FACTOR_DEFAULT,
            )
            or SPREAD_COMPRESSION_FACTOR_DEFAULT
        )
    except Exception:
        factor = float(SPREAD_COMPRESSION_FACTOR_DEFAULT)
    est = plan_size_estimate(df)
    if est is not None and min_bytes > 0:
        target = max(1, min(target, int(est * factor) // min_bytes))
    n = scan_partition_count(df)
    if n is not None and n * 4 <= target:
        return df.repartition(target)
    return df
