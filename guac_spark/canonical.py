"""Canonical-key scalar functions — the pURL helper analog.

GUAC's identity scalars (/root/reference/pkg/assembler/helpers/):
  PurlToPkg (purl.go:37-44)        — parse canonical string -> components
  PkgToPurl (purl.go:101-151)      — components -> canonical string,
                                     qualifiers sorted by key
  guac-purl fabrication (purl.go:272-295) — fallback ids for unknowns
  hierarchical keys w/ sentinel (package.go:26-99) — empty segment sentinel
  artifact key (artifact.go:33-43) — lower(algorithm):lower(digest)

All pure JVM column expressions (split/regexp/map/array builtins) — the
whole canonicalization layer stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMPTY_SENTINEL = "guac-empty-@@"  # mirrors helpers/package.go:26-99


def parse_entity_id(col: Column | str) -> Column:
    """'ent:<kind>/<name>' | 'turn:<conv>:<idx>' -> struct(scheme, kind, name).

    The PurlToPkg analog: canonical strings decompose deterministically;
    unparseable input yields a null struct (callers filter, mirroring
    GUAC's parse-error skip).
    """
    c = F.col(col) if isinstance(col, str) else col
    ent = F.struct(
        F.lit("ent").alias("scheme"),
        F.regexp_extract(c, r"^ent:([a-z]+)/", 1).alias("kind"),
        # name stops at '?': qualifiers are a separate identity level
        # (parse_qualifiers), like pURL qualifiers after the version
        F.regexp_extract(c, r"^ent:[a-z]+/([^?]+)", 1).alias("name"),
    )
    turn = F.struct(
        F.lit("turn").alias("scheme"),
        F.lit("turn").alias("kind"),
        F.regexp_extract(c, r"^turn:(.+)$", 1).alias("name"),
    )
    return (
        F.when(c.startswith("ent:"), ent)
        .when(c.startswith("turn:"), turn)
        .otherwise(F.lit(None).cast("struct<scheme:string,kind:string,name:string>"))
    )


def build_entity_id(
    kind: Column | str, name: Column | str,
    qualifiers: Column | None = None,
) -> Column:
    """Components -> canonical string (PkgToPurl analog); empty names get
    the sentinel so hierarchy levels stay addressable. A non-empty
    qualifiers map appends '?k1=v1&k2=v2' with keys SORTED
    (canonical_qualifiers) — qualifiers are part of identity at the
    version level exactly like GUAC's package trie
    (package.graphql:20-101, keyvalue/pkg.go:58-76); unsorted qualifiers
    would make identical entities distinct nodes."""
    k = F.col(kind) if isinstance(kind, str) else kind
    n = F.col(name) if isinstance(name, str) else name
    safe = F.when((n.isNull()) | (n == ""), F.lit(EMPTY_SENTINEL)).otherwise(n)
    base = F.concat(F.lit("ent:"), k, F.lit("/"), safe)
    if qualifiers is None:
        return base
    return F.concat(
        base,
        F.when(
            F.size(qualifiers) > 0,
            F.concat(F.lit("?"), canonical_qualifiers(qualifiers)),
        ).otherwise(F.lit("")),
    )


def parse_qualifiers(col: Column | str) -> Column:
    """canonical string -> map<string,string> of its '?k=v&...' qualifier
    suffix (empty map when absent) — the inverse of build_entity_id's
    qualifier arm, so qualifier-bearing entities round-trip."""
    c = F.col(col) if isinstance(col, str) else col
    qstr = F.regexp_extract(c, r"\?(.+)$", 1)
    return F.when(
        qstr == "",
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ),
    ).otherwise(F.str_to_map(qstr, F.lit("&"), F.lit("=")))


def fallback_entity_id(surface: Column | str) -> Column:
    """guac-purl fabrication analog: identity for surfaces nothing claims.
    Sanitizes to the canonical charset (purl.go SanitizeString analog)."""
    s = F.col(surface) if isinstance(surface, str) else surface
    clean = F.regexp_replace(F.lower(s), r"[^a-z0-9-]", "-")
    return F.concat(F.lit("ent:unk/"), clean)


def artifact_key(algorithm: Column | str, digest: Column | str) -> Column:
    """lower(alg):lower(digest) (artifact.go:33-43)."""
    a = F.col(algorithm) if isinstance(algorithm, str) else algorithm
    d = F.col(digest) if isinstance(digest, str) else digest
    return F.lower(F.concat_ws(":", a, d))


def canonical_qualifiers(qmap: Column | str) -> Column:
    """map<string,string> -> 'k1=v1&k2=v2' with keys sorted — GUAC sorts
    qualifier keys before they enter the identity (keyvalue/pkg.go:509-522,
    helpers/purl.go:104-112); unsorted qualifiers would make identical
    packages distinct nodes."""
    m = F.col(qmap) if isinstance(qmap, str) else qmap
    entries = F.array_sort(F.map_entries(m))
    return F.array_join(
        F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        "&",
    )


def vertex_id(canonical: Column | str) -> Column:
    """Deterministic content id — ent UUIDv5 analog (helpers.go:198-200)."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.sha2(c, 256)


def canonicalize_vertices(df: DataFrame, canonical_col: str = "canonical"
                          ) -> DataFrame:
    """Attach parsed components + vertex_id to a canonical-string column."""
    return df.withColumn("parsed", parse_entity_id(canonical_col)).withColumn(
        "vertex_id", vertex_id(canonical_col)
    )
