"""Table loaders for the driver-provided parquet testdata (TESTDATA.md).

One function so every operator reads through the same path: a plain
columnar parquet scan that Catalyst can push filters/projections into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Version-adaptive raw read of an events parquet (TIMESTAMP(NANOS) ts).

    Spark 4.x reads NANOS natively as TIMESTAMP_NTZ (floor-truncated to µs —
    identical to DuckDB's µs arithmetic), so the plain read succeeds and no
    legacy conf is ever touched. Older builds reject the NANOS logical type
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, which yields raw
    nano LongType — only then is the conf set, and it is left set
    deliberately: on such a build *every* events read (batch and streaming)
    needs it, so batch and stream stay consistent by construction.
    """
    try:
        return _read_parquet_cached_schema(spark, path)
    except Exception as ex:
        # Only the NANOS-rejection case warrants the legacy conf — a
        # transient failure (missing file, permissions) must re-raise
        # untouched, or it would flip every later events read in the
        # session to raw-nano LongType.
        msg = str(ex)
        if "NANOS" not in msg and "nanosAsLong" not in msg:
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def pin_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (tz-stability contract).

    Every testdata timestamp column is tz-naive (parquet MICROS/NANOS,
    isAdjustedToUTC=false → TIMESTAMP_NTZ on Spark ≥4), and the DuckDB
    oracle does naive-timestamp arithmetic. Any NTZ↔LTZ coercion Spark
    inserts — ``lit(...).cast('timestamp')`` predicate boundaries, the
    events ``ts`` normalization, date_trunc/window/hour over the result —
    goes through the *session* timezone, so a vanilla session on a non-UTC
    host would shift instants vs the oracle. Pinning UTC at plan-build time
    (every op reads through :func:`table`) makes all of it tz-stable
    regardless of host timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_events_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize the raw ``ts`` column (NTZ or raw-nano long, per the Spark
    version) to one µs TimestampType every downstream op sees, under the
    UTC pin (:func:`pin_utc`) so the NTZ→LTZ cast is tz-stable.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    pin_utc(spark)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Schema-by-path cache for table(): spark.read.parquet() re-infers the
# schema from parquet footers on EVERY call (~90-120 ms of driver time per
# table measured on this host — the single largest plan-construction cost
# in the r12 profile; guide §5, the driver should do almost no data work).
# Passing the schema explicitly skips inference. This caches METADATA only
# (never data or results) and is invalidated by a stat fingerprint
# (size + mtime_ns of the SINGLE file — directory tables are never cached:
# _path_stat_key raises for them, so they always take the plain-read
# path), so a regenerated table re-infers. Same class as Spark's own
# FileIndex cache. Keyed by path alone, which assumes one set of
# schema-affecting parquet confs per process (ADVICE r12): a second
# SparkSession in the same process with different inference confs (e.g.
# nanosAsLong, NTZ inference) would reuse schemas inferred under the
# first's — every harness in this repo builds sessions with identical
# parquet confs, and the events table (the one conf-sensitive reader)
# goes through read_events_raw, which handles the NANOS fork itself.
_SCHEMA_CACHE: dict = {}


def _path_stat_key(path: str):
    import os

    st = os.stat(path)
    if os.path.isdir(path):
        # Directory tables: a full os.walk per plan build could cost more
        # than the footer inference it avoids at production file counts —
        # don't cache those (raise → caller takes the plain-read path).
        raise OSError("directory table — schema cache skipped")
    return (st.st_size, st.st_mtime_ns)


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    try:
        stat_key = _path_stat_key(path)
    except OSError:
        return spark.read.parquet(path)  # dirs / globs / remote: plain read
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None and cached[0] == stat_key:
        return spark.read.schema(cached[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = (stat_key, df.schema)
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table; filters/pruning push into the parquet read.

    ``events`` goes through the version-adaptive raw read + ts
    normalization above; everything else is a plain columnar scan with
    pushdown (schema resolved once per file fingerprint — see
    _SCHEMA_CACHE).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    pin_utc(spark)
    if name == "events":
        df = read_events_raw(spark, f"{sf_dir}/{name}.parquet")
        return normalize_events_ts(spark, df)
    return _read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


# Version tag for cross-process state directories under /tmp. These dirs
# are memoized by existence (skip-if-_SUCCESS), and /tmp OUTLIVES one
# driver round — without a version in the name, a logic change in a
# state-producing op would silently serve state written by old code.
# Bump when any state-producing op changes its written content.
STATE_VERSION = "v3"  # r3: fixed-k IVF quantizer changes persisted index content


def _file_print(full: str, rel: str) -> str:
    """One file's fingerprint line: (relpath, size, mtime_ns) plus a
    64-byte head/tail content sample (ADVICE r11: a same-size corpus
    regeneration on a filesystem with coarse mtime granularity could
    slip past a pure stat fingerprint; parquet head/tail cover the
    magic + footer metadata, which change with any rewrite)."""
    import hashlib
    import os

    st = os.stat(full)
    with open(full, "rb") as fh:
        head = fh.read(64)
        fh.seek(max(0, st.st_size - 64))
        tail = fh.read(64)
    sample = hashlib.md5(head + tail).hexdigest()[:8]
    return f"{rel}:{st.st_size}:{st.st_mtime_ns}:{sample}"


def _sf_data_fingerprint(sf_dir: str) -> str:
    """Cheap filesystem fingerprint of every parquet table under
    ``sf_dir`` — (relative path, size, mtime_ns, 128-byte content
    sample) per file, md5-folded. The _corpus_fingerprint idea
    (llm_ops, ADVICE r9) applied to the whole dataset: it changes
    whenever ANY table is rewritten."""
    import glob
    import hashlib
    import os

    parts: list[str] = []
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            if os.path.isdir(p):
                for root, dirs, files in os.walk(p):
                    dirs.sort()
                    for f in sorted(files):
                        full = os.path.join(root, f)
                        parts.append(_file_print(full, os.path.relpath(full, sf_dir)))
            else:
                parts.append(_file_print(p, os.path.basename(p)))
        except OSError:
            continue
    return hashlib.md5("\n".join(parts).encode()).hexdigest()[:10]


def state_dir(tag: str, sf_dir: str) -> str:
    """Process-independent state directory for op ``tag`` at ``sf_dir``,
    versioned two ways so stale state is never reused: STATE_VERSION
    (older CODE revisions) and a dataset fingerprint (older DATA — a
    harness that regenerates the corpus at the same path must not be
    served state derived from the previous files; the r10 BPE-memo bug
    class, closed here for every state-dir-guarded op at once)."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"bpspark_{tag}_{STATE_VERSION}_"
        f"{os.path.basename(sf_dir.rstrip('/'))}_{_sf_data_fingerprint(sf_dir)}",
    )


def cleanup_stale_state(
    dry_run: bool = False, sf_dirs: list[str] | None = None
) -> list[str]:
    """Delete state dirs written under OLDER STATE_VERSIONs — the garbage
    the version bump necessarily leaves behind (a bump orphans every
    ``bpspark_{tag}_{old}_{sf}`` tree; /tmp outlives rounds, so without
    this they accumulate one generation per bump). With ``sf_dirs``,
    additionally prune SUPERSEDED-FINGERPRINT dirs at the current
    version (ADVICE r11): for each given dataset path, any
    ``bpspark_{tag}_{cur}_{base}_{fp}`` whose basename matches but whose
    fingerprint differs from the dataset's LIVE fingerprint was written
    against a previous generation of the data and can never be read
    again. Current-version, current-fingerprint dirs are never touched.
    Returns the removed (or, with ``dry_run``, would-be-removed) paths.
    Invoked manually or from session setup — never from inside an op
    (ops must not mutate global state)."""
    import glob
    import os
    import re
    import shutil
    import tempfile

    live_fp = {
        os.path.basename(d.rstrip("/")): _sf_data_fingerprint(d)
        for d in (sf_dirs or [])
    }
    # fingerprint suffix OPTIONAL: dirs written by pre-fingerprint code
    # generations have none — the version GC must still remove them
    pat = re.compile(r"^bpspark_[A-Za-z0-9]+_(v\d+)_(.+?)(?:_([0-9a-f]{10}))?$")
    removed: list[str] = []
    for path in glob.glob(os.path.join(tempfile.gettempdir(), "bpspark_*_v*_*")):
        m = pat.match(os.path.basename(path))
        if not (m and os.path.isdir(path)):
            continue
        ver, base, fp = m.group(1), m.group(2), m.group(3)
        stale_version = ver != STATE_VERSION
        superseded = (
            ver == STATE_VERSION
            and fp is not None
            and base in live_fp
            and fp != live_fp[base]
        )
        if stale_version or superseded:
            removed.append(path)
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
    return sorted(removed)
