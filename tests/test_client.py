"""Client-surface tests over all three transports (reference test analogs:
tests/client/class_ref_test.py:21-179, future_test.py:11-197)."""

from __future__ import annotations

import pytest

from stateflow_spark.client import (
    Client,
    EntityHandle,
    LocalTransport,
    SuperstepTransport,
    StreamingTransport,
)

# registers User/Item/A/B fixtures
from tests.test_entity_local import A, B, Item, User  # noqa: F401


def _buy_item_scenario(client: Client):
    """The reference's demo flow: create user+item, stock, buy, verify."""
    User_ = client.entity(User)
    Item_ = client.entity(Item)

    user = User_("client-user").get()
    item = Item_("client-item", 5).get()
    assert isinstance(user, EntityHandle)

    user.update_balance(20).get()
    item.update_stock(4).get()
    assert user.buy_item(3, item).get() is True

    # attribute reads = GET_STATE round trips (golden values:
    # reference tests/stateflow_test.py:196-202)
    assert user.balance == 5
    assert item.stock == 1

    # attribute write = UPDATE_STATE
    user.balance = 42
    assert user.balance == 42

    # find: hit + miss
    assert client.find(User, "client-user").get().ref == user.ref
    with pytest.raises(KeyError):
        client.find(User, "missing").get()

    assert client.ping() is True

    # duplicate create fails
    with pytest.raises(RuntimeError, match="already exists"):
        User_("client-user").get()


def test_client_local_transport():
    _buy_item_scenario(Client(LocalTransport()))


@pytest.mark.slow
def test_client_superstep_transport(spark):
    _buy_item_scenario(Client(SuperstepTransport(spark)))


@pytest.mark.slow
def test_client_superstep_batching(spark):
    """Many calls queued, one flush → one distributed job settles all."""
    client = Client(SuperstepTransport(spark))
    User_ = client.entity(User)
    futs = [User_(f"batch-u{i}") for i in range(20)]
    handles = [f.get() for f in futs]  # first .get() flushes all creates
    ups = [h.update_balance(i) for i, h in enumerate(handles)]
    ups[0].get()
    assert all(u.is_done for u in ups)
    assert handles[7].balance == 7


@pytest.mark.slow
def test_client_streaming_transport(spark, tmp_path):
    from stateflow_spark.streaming.stateful import StreamingEntityEngine

    engine = StreamingEntityEngine(spark, str(tmp_path / "client_engine"))
    client = Client(StreamingTransport(engine))
    User_ = client.entity(User)
    fut = User_("stream-client-u")
    engine.start()
    try:
        user = fut.get()
        user.update_balance(11).get()
        assert user.balance == 11
    finally:
        engine.stop()


def test_client_async_futures(spark):
    """Awaitable futures (reference AsyncClassRef): queue many calls, await
    them concurrently — one flush settles the whole batch."""
    import asyncio

    client = Client(SuperstepTransport(spark))
    User_ = client.entity(User)

    async def scenario():
        creates = [User_(f"async-u{i}") for i in range(8)]
        handles = await asyncio.gather(*creates)
        ups = [h.update_balance(i) for i, h in enumerate(handles)]
        await asyncio.gather(*ups)
        return handles

    handles = asyncio.run(scenario())
    assert handles[5].balance == 5
