"""Deterministic transcript corpus + entity alias dictionary.

The driver's testdata has no transcripts table, so the engine ships a
deterministic derivation of one from the `events` parquet: every transform is
expressible in BOTH Spark SQL and DuckDB SQL, so the DuckDB oracle can
regenerate the byte-identical corpus and every downstream KG stage gets a
full value-hash correctness check (the analog of GUAC's pinned guac-data
corpus, /root/reference/internal/testing/e2e/e2e:37).

Schema (fixed by BASELINE.json input_hint):
    conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp

Mention grammar embedded in `text` (our analog of SBOM/attestation syntax):
    @<alias>        person mention          -> (turn, mentions, ent:person/*)
    #topic_<k>      topic mention           -> (turn, about, ent:topic/*)
    tool:<name>     tool invocation         -> (turn, uses_tool, ent:tool/*)
    >><k>           reply reference         -> (turn, replies_to, turn:*)
    @a aka @b       alias equivalence       -> (resolve(a), same_as, resolve(b))

The alias dictionary is engine data (the analog of GUAC's pURL known-types
table, /root/reference/pkg/assembler/helpers/purl.go:162-172): a literal
constant consumed by Spark as a broadcast DataFrame and inlined by the
oracle as a VALUES clause — one source of truth, zero drift.

Skew by construction: every `purchase` turn mentions the celebrity entity
@ada-lovelace (hot join/agg key); conversations are user-bucketed so user
activity skew produces mega-conversations.

Near-duplicate tail by construction (exercises MinHash-LSH linking):
`signup` turns mention <alias>+<last-char> (edit distance 1) and `error`
turns mention <alias>+<last-char>*2 (edit distance 2); neither variant is in
the dictionary, so they only link via LSH blocking + n-gram Jaccard, and via
the explicit `aka` same_as edges — both paths must converge in CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- entity inventory (literal engine data; single source of truth) -------

PERSONS: list[str] = [
    "ada-lovelace",        # pid 0 — the celebrity hot key
    "grace-hopper",
    "alan-turing",
    "kurt-goedel",
    "john-mccarthy",
    "claude-shannon",
    "edsger-dijkstra",
    "donald-knuth",
    "barbara-liskov",
    "tim-berners-lee",
    "linus-torvalds",
    "margaret-hamilton",
    "katherine-johnson",
    "dennis-ritchie",
    "ken-thompson",
    "bjarne-stroustrup",
    "guido-van-rossum",
    "james-gosling",
    "brendan-eich",
    "anders-hejlsberg",
    "yukihiro-matsumoto",
    "rasmus-lerdorf",
    "rich-hickey",
    "martin-odersky",
    "graydon-hoare",
]

N_TOPICS = 20
TOOLS = ["tool_purchase", "tool_error"]

CELEBRITY = PERSONS[0]

# roles per event_type (closed mapping, analog of GUAC's DocumentType guess,
# /root/reference/pkg/handler/processor/guesser/guesser.go:25)
ROLE_CASE = (
    "CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant' "
    "WHEN 'signup' THEN 'system' ELSE 'tool' END"
)

# --- the canonical corpus SQL (common Spark/DuckDB dialect) ----------------

# references two relations: `events` (driver parquet) and
# `alias_base(pid, alias)` (the PERSONS inventory).
CORPUS_SQL = f"""
WITH ev AS (
  SELECT event_id, ts, user_id, event_type, value,
         'conv-' || lpad(cast(user_id AS STRING), 5, '0') || '-'
                 || cast(event_id % 8 AS STRING) AS conv_id,
         cast(cast(floor(value) AS INT) % {N_TOPICS} AS STRING) AS topic_k
  FROM events
),
numbered AS (
  SELECT ev.*,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1
           AS turn_idx
  FROM ev
)
SELECT /*+ BROADCAST(a1), BROADCAST(a2) */
  n.conv_id,
  cast(n.turn_idx AS INT) AS turn_idx,
  {ROLE_CASE.replace('event_type', 'n.event_type')} AS role,
  CASE n.event_type
    WHEN 'click' THEN
      'please review @' || a1.alias || ' and #topic_' || n.topic_k
      || CASE WHEN n.turn_idx > 0
              THEN ' >>' || cast(n.turn_idx - 1 AS STRING) ELSE '' END
      || CASE WHEN n.event_id % 7 = 0
              THEN ' per @mystery-guest-'
                   || substr('abcde', cast(n.event_id % 5 AS INT) + 1, 1)
              ELSE '' END
    WHEN 'view' THEN
      'comparing @' || a1.alias || ' with @' || a2.alias
      || ' on #topic_' || n.topic_k
    WHEN 'purchase' THEN
      'invoked tool:tool_purchase for @{CELEBRITY} regarding @' || a1.alias
    WHEN 'error' THEN
      'tool:tool_error flagged @' || a1.alias || right(a1.alias, 1)
      || right(a1.alias, 1) || ' aka @' || a1.alias || right(a1.alias, 1)
    WHEN 'signup' THEN
      'register @' || a1.alias || right(a1.alias, 1) || ' aka @' || a1.alias
  END AS text,
  CASE WHEN n.event_type IN ('purchase', 'error')
       THEN 'tool_' || n.event_type END AS tool,
  n.ts
FROM numbered n
JOIN alias_base a1 ON a1.pid = n.event_id % {len(PERSONS)}
JOIN alias_base a2 ON a2.pid = (n.event_id + 7) % {len(PERSONS)}
"""


def alias_base_values_sql() -> str:
    """Render the PERSONS inventory as a VALUES relation (DuckDB oracle)."""
    rows = ", ".join(f"({i}, '{a}')" for i, a in enumerate(PERSONS))
    return f"(VALUES {rows}) AS alias_base(pid, alias)"


def duckdb_prelude() -> str:
    """CTE prelude giving DuckDB `alias_base` + `transcripts`."""
    rows = ", ".join(f"({i}, '{a}')" for i, a in enumerate(PERSONS))
    body = CORPUS_SQL.strip()
    return (
        f"WITH alias_base(pid, alias) AS (VALUES {rows}),\n"
        f"transcripts AS (\n{body}\n)"
    )


def register_alias_base(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(PERSONS)], "pid int, alias string"
    )
    df.createOrReplaceTempView("alias_base")
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic transcripts table for a scale-factor directory.

    Declarative Spark SQL end-to-end: the parquet scan, the window, and the
    template CASEs all stay inside Catalyst/whole-stage-codegen. At cluster
    scale this would be a plain `spark.read.format('iceberg')` of a real
    transcripts table; the derivation is the sandbox stand-in.
    """
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    register_alias_base(spark)
    return spark.sql(CORPUS_SQL)


def alias_dict(spark: SparkSession) -> DataFrame:
    """Entity-linking dictionary (FIXTURES.md §2): alias -> entity_id.

    Head aliases only — the near-duplicate tail is deliberately absent and
    reachable only via LSH (link.py). Analog of pURL determinism:
    same alias => same node (/root/reference/pkg/assembler/helpers/purl.go).
    """
    rows = [(a, f"ent:person/{a}", "person", 1.0) for a in PERSONS]
    rows += [
        (f"topic_{k}", f"ent:topic/topic_{k}", "topic", 1.0)
        for k in range(N_TOPICS)
    ]
    rows += [(t, f"ent:tool/{t}", "tool", 1.0) for t in TOOLS]
    return spark.createDataFrame(
        rows, "alias string, entity_id string, kind string, prior double"
    )


def alias_dict_values_sql() -> str:
    """Same dictionary as a VALUES relation for the DuckDB oracle."""
    rows = [(a, f"ent:person/{a}", "person", 1.0) for a in PERSONS]
    rows += [
        (f"topic_{k}", f"ent:topic/topic_{k}", "topic", 1.0)
        for k in range(N_TOPICS)
    ]
    rows += [(t, f"ent:tool/{t}", "tool", 1.0) for t in TOOLS]
    rendered = ", ".join(
        f"('{al}', '{e}', '{k}', {p})" for al, e, k, p in rows
    )
    return f"(VALUES {rendered}) AS alias_dict(alias, entity_id, kind, prior)"
