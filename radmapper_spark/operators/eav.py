"""EAV shred: nested DataFrames -> triples(eid, attr, val) (SURVEY.md §2.4).

The reference gets EAV for free by transacting into Datahike
(reference: query.cljc:270-298); here it is an explicit long-format frame:

    eid  LONG     -- entity surrogate id
    attr STRING
    val  STRUCT<s STRING, n DOUBLE, b BOOLEAN, ref LONG>  -- variant value

Cardinality-many = one row per element. Child objects get fresh eids and a
`ref` edge from the parent — the Spark analog of the reference's boxing
through :db.type/ref slots (util.cljc:299-322).

Scale: long-skinny tables hash-partition on eid; per-attribute frames
(`attr = lit` filters) prune early and are typically broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VAL_STRUCT = "struct<s:string,n:double,b:boolean,ref:bigint>"


def _val_col(col, dtype: str):
    s = F.lit(None).cast("string")
    n = F.lit(None).cast("double")
    b = F.lit(None).cast("boolean")
    ref = F.lit(None).cast("bigint")
    if dtype == "boolean":
        b = col
    elif dtype in ("bigint", "int", "smallint", "tinyint", "double", "float", "decimal"):
        n = col.cast("double")
    else:
        s = col.cast("string")
    return F.struct(s.alias("s"), n.alias("n"), b.alias("b"), ref.alias("ref"))


def melt_flat(df: DataFrame) -> DataFrame:
    """Flat table -> EAV (used for attribute-wildcard queries)."""
    attr_types: dict[str, str] = {}
    df = df.withColumn("__eid", F.monotonically_increasing_id())
    pieces = []
    for name, dtype in df.dtypes:
        if name == "__eid":
            continue
        attr_types[name] = dtype
        pieces.append(
            df.select(
                F.col("__eid").alias("eid"),
                F.lit(name).alias("attr"),
                _val_col(F.col(f"`{name}`"), dtype).alias("val"),
            ).filter(F.col("val.s").isNotNull() | F.col("val.n").isNotNull()
                     | F.col("val.b").isNotNull() | F.col("val.ref").isNotNull())
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # per-attribute source types: lets the query compiler keep NATIVE-typed
    # binding values instead of the string coalesce (ADVICE: typed bindings)
    out.rm_attr_types = attr_types
    return out


_SIGN_BIT = -0x8000000000000000  # int64 sign bit


def _child_eid(peid_col, attr: str, pos_col):
    """Deterministic child eid from (parent eid, attr, element position).

    Sibling branches at the same depth (two struct fields, two array-of-struct
    fields) must never share eids, or a parent's ref edge equi-joins onto an
    entity from a different branch. Hashing the full provenance makes each
    branch/position distinct; setting the sign bit keeps hashed child eids
    disjoint from the non-negative monotonically_increasing_id root eids.
    """
    return F.xxhash64(peid_col, F.lit(attr), pos_col).bitwiseOR(F.lit(_SIGN_BIT))


def shred_to_eav(df: DataFrame, max_depth: int = 8) -> DataFrame:
    """Recursively shred a (possibly nested) DataFrame into EAV triples.

    Struct fields become child entities linked by `ref`; array fields emit
    one row per element (cardinality-many). Root eids come from
    monotonically_increasing_id (non-negative); child eids are hashed from
    (parent eid, attr, position) — deterministic, branch-distinct, and
    disjoint from the root range via the sign bit.
    """
    frames: list[DataFrame] = []
    attr_types: dict[str, str] = {}

    def note_type(attr: str, t: str):
        # same attr name at different nesting levels with conflicting types
        # -> unknown (query compiler falls back to string coalesce)
        if attr_types.get(attr, t) != t:
            attr_types[attr] = "conflict"
        else:
            attr_types[attr] = t

    def walk(frame: DataFrame, eid_col, prefix_level: int):
        if prefix_level > max_depth:
            return
        for field in frame.schema.fields:
            name, dt = field.name, field.dataType
            if name == "__eid":
                continue
            col = F.col(f"`{name}`")
            if isinstance(dt, T.StructType):
                child = (
                    frame.select(eid_col.alias("__peid"), col.alias("__child"))
                    .filter(F.col("__child").isNotNull())
                    .withColumn("__eid", _child_eid(F.col("__peid"), name, F.lit(0)))
                )
                frames.append(child.select(
                    F.col("__peid").alias("eid"), F.lit(name).alias("attr"),
                    F.struct(
                        F.lit(None).cast("string").alias("s"),
                        F.lit(None).cast("double").alias("n"),
                        F.lit(None).cast("boolean").alias("b"),
                        F.col("__eid").alias("ref"),
                    ).alias("val"),
                ))
                note_type(name, "ref")
                walk(child.select("__eid", "__child.*"), F.col("__eid"), prefix_level + 1)
            elif isinstance(dt, T.ArrayType):
                elem = (
                    frame.select(eid_col.alias("__peid"),
                                 F.posexplode(col).alias("__pos", "__elem"))
                )
                if isinstance(dt.elementType, T.StructType):
                    elem = elem.withColumn(
                        "__eid", _child_eid(F.col("__peid"), name, F.col("__pos")))
                    frames.append(elem.select(
                        F.col("__peid").alias("eid"), F.lit(name).alias("attr"),
                        F.struct(
                            F.lit(None).cast("string").alias("s"),
                            F.lit(None).cast("double").alias("n"),
                            F.lit(None).cast("boolean").alias("b"),
                            F.col("__eid").alias("ref"),
                        ).alias("val"),
                    ))
                    note_type(name, "ref")
                    walk(elem.select("__eid", "__elem.*"), F.col("__eid"), prefix_level + 1)
                else:
                    dtype = elem.schema["__elem"].dataType.simpleString()
                    note_type(name, dtype)
                    frames.append(elem.select(
                        F.col("__peid").alias("eid"), F.lit(name).alias("attr"),
                        _val_col(F.col("__elem"), dtype).alias("val"),
                    ))
            else:
                note_type(name, dt.simpleString())
                frames.append(frame.select(
                    eid_col.alias("eid"), F.lit(name).alias("attr"),
                    _val_col(col, dt.simpleString()).alias("val"),
                ).filter(col.isNotNull()))

    root = df.withColumn("__eid", F.monotonically_increasing_id())
    walk(root, F.col("__eid"), 0)
    out = frames[0]
    for p in frames[1:]:
        out = out.unionByName(p)
    out.rm_attr_types = attr_types
    return out
