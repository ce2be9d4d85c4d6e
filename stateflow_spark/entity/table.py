"""Entity state as a relational table — the bridge the reference cannot
offer.

The reference's entity state lives as opaque per-key bytes inside
Flink/Beam state backends or DynamoDB (stateflow/dataflow/state.py:26-32);
querying it means writing another dataflow. Here the distributed state
DataFrame of a SuperstepRuntime run (or any (entity, key, blob) state
snapshot) unpacks into a *typed* DataFrame derived from the entity's
AST-extracted state schema — so the whole relational surface (SQL, joins,
aggregations against the TPC-H tables) applies directly to live entity
state.

Type mapping follows the reference's observed hint vocabulary
(SURVEY.md §1.2: str/int/bool/float, List[...] and references; everything
else round-trips as a JSON string column). At scale the unpack is one
Arrow-batched mapInPandas over the partition-local state rows — no
shuffle, no driver collection."""

from __future__ import annotations

import json
import pickle
from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stateflow_spark.entity.model import EntityRef
from stateflow_spark.entity.registry import get_entity_type

_HINT_TYPES: dict[str, DataType] = {
    "str": StringType(),
    "int": LongType(),
    "bool": BooleanType(),
    "float": DoubleType(),
}


def state_schema(entity_name: str) -> StructType:
    """StructType for one entity type: key + one column per state attr.
    Unmapped hints (lists, entity refs, NoType) become JSON string columns."""
    et = get_entity_type(entity_name)
    # "_key" to avoid colliding with state attributes named "key" (YCSB!)
    fields = [StructField("_key", StringType(), False)]
    for attr, hint in sorted(et.desc.state_hints.items()):
        fields.append(
            StructField(attr, _HINT_TYPES.get(hint, StringType()), True)
        )
    return StructType(fields)


def _jsonable(v):
    if isinstance(v, EntityRef):
        return {"_type": "InternalClassRef", "entity": v.entity, "key": v.key}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def state_table(state_df: DataFrame, entity_name: str) -> DataFrame:
    """Unpack an (entity, key, blob) state DataFrame into the typed table
    for one entity type. Runs partition-local (mapInPandas, no shuffle)."""
    schema = state_schema(entity_name)
    typed_cols = [
        (f.name, f.dataType) for f in schema.fields if f.name != "_key"
    ]

    def unpack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for key, blob in zip(pdf["key"], pdf["blob"]):
                state = pickle.loads(bytes(blob))
                row = {"_key": key}
                for name, dtype in typed_cols:
                    v = state.get(name)
                    if not isinstance(dtype, (LongType, DoubleType, BooleanType)) \
                            and not isinstance(v, (str, type(None))):
                        v = json.dumps(_jsonable(v), separators=(",", ":"))
                    elif isinstance(dtype, StringType) and v is not None:
                        v = str(v)
                    row[name] = v
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return (
        state_df.filter(state_df.entity == entity_name)
        .select("key", "blob")
        .mapInPandas(unpack, schema)
    )
