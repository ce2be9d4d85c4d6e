"""Pytest plumbing for users of the engine — reference parity with
stateflow/util/stateflow_test.py (an autouse fixture handing tests a
synchronous local client over the registered entity types).

Usage in a user's conftest.py:

    from stateflow_spark.testing import stateflow_test  # noqa: F401

Every test then receives `stateflow_test`, a `Client` over the in-process
LocalTransport — entity creation, invocation, and cross-entity flows run
synchronously with no Spark session, exactly like the reference's
LocalRuntime-backed fixture.
"""

from __future__ import annotations

from pytest import fixture

from stateflow_spark.client import Client, LocalTransport


@fixture()
def stateflow_test() -> Client:
    """A synchronous local client over all registered entity types."""
    return Client(LocalTransport())
