"""Conversation-export ingest: nested Claude / ChatGPT JSON ->
normalized ``conversations`` + ``messages`` tables.

Reference lifecycle (uni_parse.py:547-569): char-level streaming JSON
array parser -> platform sniff -> per-conversation normalize ->
INSERT OR REPLACE in chunks. Spark-first replacement:

* S1 streaming array scan -> ``spark.read.json(multiLine=True)``;
  Spark's Jackson scanner is already incremental per record and
  distributes across files. No hand-rolled brace parser.
* S2 platform sniff -> schema probe on the inferred DataFrame
  (presence of ``chat_messages`` vs ``mapping``).
* S3 Claude normalize -> ``posexplode(chat_messages)``; order_index =
  array position (uni_parse.py:332).
* S4 ChatGPT tree flatten -> per-conversation BFS in ``applyInPandas``
  at ingest only (SURVEY §3.1: keep trees out of the query path);
  order_index = BFS visit position (uni_parse.py:380-421,502).
* S5 upsert -> ``dropDuplicates(["id"])`` keep-last + atomic
  overwrite (swap-in parquet; Delta MERGE on a real lake).
* content truncated to 100,000 chars at ingest (uni_parse.py:329,
  497-499).
* timestamps: ISO with Z and unix epochs both normalized to UTC
  timestamps (uni_parse.py:510-544).

Target schema == SURVEY §1.1 (uni_parse.py:28-60), with TimestampType
for the string-encoded SQLite timestamps and metadata kept as a JSON
string column (queried via get_json_object).
"""

from __future__ import annotations

import json
from collections import deque
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MAX_CONTENT_CHARS = 100_000

CONVERSATIONS_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("title", StringType()),
        StructField("platform", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
        StructField("account_id", StringType()),
        StructField("original_id", StringType()),
        StructField("metadata", StringType()),
    ]
)

MESSAGES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("conversation_id", StringType()),
        StructField("parent_id", StringType()),
        StructField("sender", StringType()),
        StructField("role", StringType()),
        StructField("content", StringType()),
        StructField("created_at", TimestampType()),
        StructField("model", StringType()),
        StructField("order_index", IntegerType()),
        StructField("metadata", StringType()),
    ]
)


def _norm_ts(col):
    """ISO timestamps with trailing Z / offsets / fractional seconds ->
    UTC timestamp (uni_parse.py:510-527 normalization)."""
    c = F.regexp_replace(col.cast("string"), "Z$", "+00:00")
    return F.to_timestamp(c)


def detect_platform(spark: SparkSession, path: str) -> str:
    """S2: sniff 'claude' vs 'chatgpt' by probing the inferred schema
    for the marker fields (uni_parse.py:88-123 reads the file head;
    the schema probe is the distributed equivalent)."""
    df = spark.read.option("multiLine", "true").json(path)
    fields = set(df.schema.fieldNames())
    if "chat_messages" in fields:
        return "claude"
    if "mapping" in fields:
        return "chatgpt"
    raise ValueError(f"cannot detect platform for {path}: fields={sorted(fields)}")


# ---------------------------------------------------------------------------
# Claude (S3)
# ---------------------------------------------------------------------------


def ingest_claude(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Claude export JSON array -> (conversations, messages)."""
    raw = spark.read.option("multiLine", "true").json(path)

    convs = raw.select(
        F.col("uuid").cast("string").alias("id"),
        F.col("name").cast("string").alias("title"),
        F.lit("claude").alias("platform"),
        _norm_ts(F.col("created_at")).alias("created_at"),
        _norm_ts(F.col("updated_at")).alias("updated_at"),
        F.get_json_object(F.to_json(F.col("account")), "$.uuid").alias("account_id"),
        F.col("uuid").cast("string").alias("original_id"),
        F.to_json(F.struct(F.col("summary"))).alias("metadata"),
    )

    msgs = raw.select(
        F.col("uuid").cast("string").alias("conversation_id"),
        F.posexplode("chat_messages").alias("order_index", "m"),
    ).select(
        F.col("m.uuid").cast("string").alias("id"),
        "conversation_id",
        F.lit(None).cast("string").alias("parent_id"),  # NULL for Claude (uni_parse.py:326)
        F.col("m.sender").cast("string").alias("sender"),
        F.col("m.sender").cast("string").alias("role"),  # role = sender (uni_parse.py:328)
        F.substring(F.col("m.text").cast("string"), 1, MAX_CONTENT_CHARS).alias("content"),
        _norm_ts(F.col("m.created_at")).alias("created_at"),
        F.lit("claude").alias("model"),  # default model (uni_parse.py:309)
        F.col("order_index").cast("int").alias("order_index"),
        F.to_json(F.struct(F.col("m.attachments"))).alias("metadata"),
    )
    return convs, msgs


# ---------------------------------------------------------------------------
# ChatGPT (S4): BFS tree flatten per conversation
# ---------------------------------------------------------------------------


def _bfs_flatten(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per conversation: mapping JSON -> BFS-ordered message rows.

    Reference capability: uni_parse.py:380-421 (iterative traversal),
    :440-505 (row extraction). Four DELIBERATE normalization upgrades
    over the reference's traversal, certified as-such by the
    ingest_fixed oracle (round 11) rather than bug-for-bug:

    * ALL roots are visited (sorted by node id); the reference stops
      at the first parentless node in dict order and silently drops
      any other root's subtree (uni_parse.py:384-393).
    * siblings are visited in child-array order; the reference
      appends ``reversed(children)`` to a ``pop(0)`` FIFO
      (uni_parse.py:415-421), which visits siblings right-to-left --
      the comment there says "to process in correct order", the
      reversal predates the stack->queue switch.
    * order_index is DENSE over message-bearing nodes; the reference
      enumerates every visited node so indexes skip at message-less
      tree roots (uni_parse.py:424,502).
    * message id prefers the message's own ``id`` (node key as
      fallback); the reference keys every row by the node id only
      (uni_parse.py:492).

    Matched to the reference where cheap and observable: sender maps
    assistant->assistant / user->human / anything else passes through
    raw (uni_parse.py:448-452); model defaults to 'unknown'
    (uni_parse.py:477-480); non-string content parts are JSON-dumped
    (uni_parse.py:461-470 -- compact separators here, the engine-wide
    to_json convention). Parts are joined with newlines (the
    reference keeps only parts[0]; multi-part messages are real in
    modern exports). Runs at ingest only; downstream queries are
    order_index-based.
    """
    for pdf in pdf_iter:
        out = []
        for _, row in pdf.iterrows():
            conv_id = row["conv_id"]
            mapping = json.loads(row["mapping_json"]) or {}
            roots = [k for k, v in mapping.items() if not v.get("parent")]
            queue = deque(sorted(roots))
            seen: set[str] = set()
            idx = 0
            while queue:
                node_id = queue.popleft()
                if node_id in seen or node_id not in mapping:
                    continue
                seen.add(node_id)
                node = mapping[node_id]
                queue.extend(c for c in node.get("children") or [])
                msg = node.get("message")
                if not msg:
                    continue
                author = (msg.get("author") or {}).get("role") or ""
                parts = (msg.get("content") or {}).get("parts") or []
                # non-string parts JSON-dumped (uni_parse.py:461-470);
                # compact separators = the engine's to_json convention
                text = "\n".join(
                    p if isinstance(p, str) else json.dumps(p, separators=(",", ":"))
                    for p in parts
                    if p
                )
                ct = msg.get("create_time")
                meta = msg.get("metadata") or {}
                out.append(
                    {
                        "id": msg.get("id") or node_id,
                        "conversation_id": conv_id,
                        "parent_id": node.get("parent"),
                        # uni_parse.py:448-452: assistant/user mapped,
                        # any other role passes through raw
                        "sender": (
                            "human"
                            if author == "user"
                            else "assistant" if author == "assistant" else author
                        ),
                        "role": author,  # raw author.role (uni_parse.py:447)
                        "content": text[:MAX_CONTENT_CHARS],
                        "created_at": (
                            pd.to_datetime(ct, unit="s", utc=True).tz_localize(None)
                            if ct
                            else None
                        ),
                        "model": meta.get("model_slug") or "unknown",  # uni_parse.py:477-480
                        "order_index": idx,
                        "metadata": json.dumps({"node_id": node_id}),
                    }
                )
                idx += 1
        yield pd.DataFrame(
            out,
            columns=[f.name for f in MESSAGES_SCHEMA.fields],
        )


def ingest_chatgpt(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """ChatGPT export JSON array -> (conversations, messages)."""
    raw = spark.read.option("multiLine", "true").json(path)

    # exports carry the id as conversation_id and/or id; use whichever
    # exists (schema-on-read: referencing a missing field won't resolve)
    fields = set(raw.schema.fieldNames())
    id_cols = [F.col(c) for c in ("conversation_id", "id") if c in fields]
    conv_id = F.coalesce(*id_cols) if len(id_cols) > 1 else id_cols[0]

    convs = raw.select(
        conv_id.cast("string").alias("id"),
        F.col("title").cast("string").alias("title"),
        F.lit("chatgpt").alias("platform"),
        F.to_timestamp(F.from_unixtime(F.col("create_time"))).alias("created_at"),
        F.to_timestamp(F.from_unixtime(F.col("update_time"))).alias("updated_at"),
        F.lit(None).cast("string").alias("account_id"),  # always NULL (uni_parse.py:367)
        conv_id.cast("string").alias("original_id"),
        # minimal metadata {"id": conv_id} (uni_parse.py:369)
        F.to_json(F.struct(conv_id.cast("string").alias("id"))).alias("metadata"),
    )

    # The tree is re-read with mapping pinned to StringType so the
    # flatten parses the RAW JSON (real dicts for non-string content
    # parts). Round-trip through the inferred struct + to_json is
    # LOSSY here: inference coerces a heterogeneous parts array to
    # array<string>, turning object parts into whitespace-preserving
    # source spans -- ingested content would depend on export file
    # formatting (caught by the ingest_fixed oracle, round 11).
    trees = (
        spark.read.option("multiLine", "true")
        .schema("conversation_id string, id string, mapping string")
        .json(path)
        .select(
            F.coalesce(F.col("conversation_id"), F.col("id")).alias("conv_id"),
            F.col("mapping").alias("mapping_json"),
        )
    )
    msgs = trees.mapInPandas(_bfs_flatten, schema=MESSAGES_SCHEMA)
    return convs, msgs


def ingest_file(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Detect platform and ingest (the parse_file entry point,
    uni_parse.py:65-86)."""
    platform = detect_platform(spark, path)
    return (
        ingest_claude(spark, path) if platform == "claude" else ingest_chatgpt(spark, path)
    )


# ---------------------------------------------------------------------------
# S5 upsert, S12 repair
# ---------------------------------------------------------------------------


def upsert_parquet(
    df: DataFrame, path: str, key: str = "id", latest_by: str | None = None
) -> None:
    """INSERT OR REPLACE semantics on parquet: union with the existing
    table (if any), keep the newest row per key, atomic overwrite.
    (On a production lake this is a Delta/Iceberg MERGE; plain parquet
    needs the read-union-rewrite.)

    The reference's sequential INSERT OR REPLACE (uni_parse.py:547-569)
    makes the LAST row per key win deterministically; a distributed
    frame has no "last" without an ordering, so precedence here is
    explicit: rows from ``df`` beat rows already in the store, and
    within ``df`` the row with the greatest ``latest_by`` value wins
    (e.g. ``order_index`` for re-exported conversations, where the
    last occurrence in file order carries the highest index). Without
    ``latest_by``, duplicate keys WITHIN one batch resolve
    arbitrarily -- pass it whenever a batch can carry duplicate keys."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    tagged = df.withColumn("_src", F.lit(1))
    try:
        existing = spark.read.parquet(path).withColumn("_src", F.lit(0))
        merged = tagged.unionByName(existing)
    except Exception:  # no existing table
        merged = tagged
    order = [F.desc("_src")] + (
        [F.desc(latest_by)] if latest_by is not None else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    merged = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )
    merged.write.mode("overwrite").parquet(path)


def read_json_with_repair(
    spark: SparkSession, path: str, salvage: bool = False
) -> DataFrame:
    """S12 JSON validation: PERMISSIVE parse keeps malformed records in
    ``_corrupt_record`` for inspection instead of failing the job.

    With ``salvage=True``, files whose array structure is broken
    (trailing commas, truncated final object -- the cases
    json_clean.py:105-224 rewrites) are repaired in-flight: complete
    top-level objects are recovered per file
    (sources/json_repair.py) and parsed with schema inference. Use the
    plain PERMISSIVE read when corrupt rows should be quarantined
    rather than silently recovered.
    """
    if salvage:
        from conversation_analysis_tools_spark.sources.json_repair import (
            repaired_objects,
        )

        objs = repaired_objects(spark, path)
        # json-lines dataset of the salvaged objects; inference over
        # the recovered rows (ingest-time edge path, file grain)
        return spark.read.json(objs.rdd.map(lambda r: r.obj))
    return (
        spark.read.option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
