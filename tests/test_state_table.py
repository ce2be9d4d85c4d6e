"""Entity-state-as-DataFrame bridge: superstep state snapshots queryable
through the full relational surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from stateflow_spark import ycsb
from stateflow_spark.entity import operator
from stateflow_spark.entity.table import state_schema, state_table

# registers User/Item fixtures
from tests.test_entity_local import Item, User  # noqa: F401


def test_state_schema_from_hints():
    s = state_schema("YCSBEntity")
    assert [(f.name, f.dataType.simpleString()) for f in s.fields] == [
        ("_key", "string"), ("key", "string"), ("value", "bigint"),
    ]


def test_state_table_roundtrip(spark):
    from stateflow_spark.streaming.superstep import SuperstepRuntime

    rt = SuperstepRuntime(spark)
    n = 50
    seeded = rt.run(
        [
            operator.make_init_event(
                "YCSBEntity", (f"st-{i}", ycsb.STARTING_AMOUNT + i)
            )
            for i in range(n)
        ]
    )
    t = state_table(seeded.state_df, "YCSBEntity")
    # typed columns straight from the AST-extracted schema
    assert dict((f.name, f.dataType.simpleString()) for f in t.schema.fields) == {
        "_key": "string", "key": "string", "value": "bigint",
    }
    # SQL over live entity state
    t.createOrReplaceTempView("ycsb_state")
    total = spark.sql(
        "SELECT SUM(value) AS s, COUNT(*) AS n FROM ycsb_state"
    ).collect()[0]
    assert total.n == n
    assert total.s == sum(ycsb.STARTING_AMOUNT + i for i in range(n))
    # and it joins/filters like any DataFrame
    top = t.orderBy(F.col("value").desc()).limit(1).collect()[0]
    assert top.value == ycsb.STARTING_AMOUNT + n - 1


def test_state_table_json_fallback_columns(spark):
    """Untyped / list-of-ref attributes land as JSON string columns."""
    from stateflow_spark.entity import entity
    from stateflow_spark.streaming.superstep import SuperstepRuntime

    @entity
    class Cart:
        def __init__(self, cid: str):
            self.cid: str = cid
            self.items = []  # no hint → JSON column

        def add(self, item: "Item"):
            self.items = self.items + [item]

        def __key__(self):
            return self.cid

    rt = SuperstepRuntime(spark)
    init_c = operator.make_init_event("Cart", ("c1",))
    init_i = operator.make_init_event("Item", ("widget", 3))
    seeded = rt.run([init_c, init_i])
    iref = seeded.replies[init_i.event_id].payload["result"]
    cref = seeded.replies[init_c.event_id].payload["result"]
    res = rt.run(
        [operator.make_invoke_event(cref, "add", (iref,))],
        state_df=seeded.state_df,
    )
    t = state_table(res.state_df, "Cart")
    row = t.collect()[0]
    assert row._key == "c1"
    import json

    items = json.loads(row.items)
    assert items == [
        {"_type": "InternalClassRef", "entity": "Item", "key": "widget"}
    ]
