"""The reference's README example (README.md:30-75) running on this engine.

A user of delftdata/stateflow switches by changing two lines: the decorator
import (@stateflow.stateflow → @entity) and the runtime construction — the
entity classes themselves are unchanged Python.

Run: python examples/demo_buy_item.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stateflow_spark.client import Client, LocalTransport, SuperstepTransport
from stateflow_spark.entity import entity


@entity
class Item:
    def __init__(self, item_name: str, price: int):
        self.item_name: str = item_name
        self.stock: int = 0
        self.price: int = price

    def update_stock(self, amount: int) -> bool:
        if (self.stock + amount) < 0:
            return False
        self.stock += amount
        return True

    def __key__(self):
        return self.item_name


@entity
class User:
    def __init__(self, username: str):
        self.username: str = username
        self.balance: int = 1

    def update_balance(self, x: int):
        self.balance += x

    def buy_item(self, amount: int, item: Item) -> bool:
        total_price = amount * item.price

        if self.balance < total_price:
            return False

        # Decrease the stock.
        decrease_stock = item.update_stock(-amount)

        if not decrease_stock:
            return False  # For some reason, stock couldn't be decreased.

        self.balance -= total_price
        return True

    def __key__(self):
        return self.username


def scenario(client: Client, tag: str) -> None:
    User_, Item_ = client.entity(User), client.entity(Item)

    user = User_(f"wouter-{tag}").get()
    item = Item_(f"coke-{tag}", 2).get()

    item.update_stock(5).get()
    user.update_balance(9)  # balance 1 → 10 (attribute-style write path ok too)

    ok = user.buy_item(4, item).get()   # cross-entity transactional flow
    assert ok is True
    assert user.balance == 10 - 8, user.balance
    assert item.stock == 1, item.stock

    broke = user.buy_item(4, item).get()  # only 2 left in balance
    assert broke is False

    print(f"[{tag}] buy_item flow ok: balance={user.balance} stock={item.stock}")


def scenario_http(client: Client, tag: str) -> None:
    """Same flow through the REST surface (reference FastAPI client analog,
    op #26) — here driven via WSGI calls; `HttpSurface(...).serve()` runs
    it as a real server."""
    import io
    import json

    from stateflow_spark.http import HttpSurface

    app = HttpSurface(client)

    def post(path, query):
        env = {"REQUEST_METHOD": "POST", "PATH_INFO": path,
               "QUERY_STRING": query, "wsgi.input": io.BytesIO(b"")}
        box = {}
        body = app(env, lambda s, h: box.update(status=s))
        return json.loads(b"".join(body))

    post("/stateflow/global/User/create", f"username=ana-{tag}")
    post("/stateflow/global/Item/create", f"item_name=fanta-{tag}&price=2")
    post("/stateflow/global/User/update_balance", f"key=ana-{tag}&x=9")
    post("/stateflow/global/Item/update_stock", f"key=fanta-{tag}&amount=5")
    ok = post(
        "/stateflow/global/User/buy_item",
        f"key=ana-{tag}&amount=4&item=fanta-{tag}",
    )
    assert ok is True
    print(f"[{tag}] buy_item over HTTP ok")


def main() -> None:
    scenario(Client(LocalTransport()), "local")
    scenario_http(Client(LocalTransport()), "http")

    from stateflow_spark.session import get_spark

    spark = get_spark(app_name="stateflow-spark-demo")
    spark.sparkContext.setLogLevel("ERROR")
    scenario(Client(SuperstepTransport(spark)), "spark")
    print("demo complete")


if __name__ == "__main__":
    main()
