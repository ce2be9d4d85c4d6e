"""HTTP surface over the entity client (reference op #26:
stateflow/client/fastapi/fastapi.py:24-315).

The reference auto-generates one REST endpoint per registered entity
method, plus ``find`` and ``ping``, with FastAPI. This module provides the
same surface as a dependency-free WSGI application (FastAPI is not in this
container); ``to_fastapi()`` builds a real FastAPI app from the same route
table when the package is importable.

Route shape (mirroring the reference's URL scheme):

    GET  /                                  welcome banner
    GET  /{root}/ping                       -> "Pong"
    GET  /{root}/{ns}/{Entity}/find/?key=k  existence ack (op #9)
    POST /{root}/{ns}/{Entity}/create?...   __init__ -> key  (op #4/5)
    POST /{root}/{ns}/{Entity}/{method}?key=k&...   invoke (ops #6,#10-18)

Method parameters arrive as query args (the reference uses FastAPI
``Depends`` query binding) or a JSON body; they are coerced with the
method descriptor's type hints, and parameters typed as another entity
(or List[entity]) accept keys and are rehydrated to entity references —
the reference's ``_replace_with_internal_ref`` (fastapi.py:177-189).
Split-method flows need no special casing here: the Client emits a FLOW
event for linked methods exactly as it does for in-process callers.

Deployment note: the surface is a thin stateless shim over a ``Client``;
at scale you run N replicas of it in front of the engine's request topic,
exactly like the reference runs its FastAPI pods in front of Kafka.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable
from urllib.parse import parse_qs

from stateflow_spark.client import Client, EntityHandle, Future
from stateflow_spark.entity.descriptors import MethodDesc, ParamDesc
from stateflow_spark.entity.model import EntityRef
from stateflow_spark.entity.registry import get_registry


def _coerce(p: ParamDesc, raw: list[str]) -> Any:
    """Coerce query-string values using the descriptor's hint — the same
    primitive set the reference generates endpoints for (str/int/bytes,
    fastapi.py:193-199) plus float/bool, and entity refs via keys."""
    if p.entity and p.is_entity_list:
        return [EntityRef(p.entity, k) for k in raw]
    if p.entity:
        return EntityRef(p.entity, raw[0])
    v = raw[0]
    hint = p.hint
    if hint == "int":
        return int(v)
    if hint == "float":
        return float(v)
    if hint == "bool":
        return v.lower() in ("1", "true", "yes")
    if hint == "bytes":
        return v.encode()
    return v


def _encode(result: Any) -> Any:
    if isinstance(result, EntityHandle):
        return {"entity": result.ref.entity, "key": result.ref.key}
    if isinstance(result, EntityRef):
        return {"entity": result.entity, "key": result.key}
    if isinstance(result, bytes):
        return result.decode("utf-8", "replace")
    if isinstance(result, tuple):
        return [_encode(x) for x in result]
    if isinstance(result, list):
        return [_encode(x) for x in result]
    return result


class HttpSurface:
    """WSGI app exposing every registered entity method over HTTP."""

    def __init__(self, client: Client, root: str = "stateflow", ns: str = "global"):
        self.client = client
        self.root = root
        self.ns = ns
        # route table: (http_method, path) -> handler(params) — one entry
        # per entity method, built once at construction like the reference's
        # create_method_endpoint loop (fastapi.py:40-55)
        self.routes: dict[tuple[str, str], Callable[[dict[str, list[str]]], Any]] = {}
        self.routes[("GET", "/")] = lambda q: "Welcome to the stateflow-spark HTTP client."
        self.routes[("GET", f"/{root}/ping")] = self._ping
        for name, et in get_registry().items():
            base = f"/{root}/{ns}/{name}"
            self.routes[("GET", f"{base}/find/")] = self._make_find(name)
            self.routes[("GET", f"{base}/find")] = self.routes[("GET", f"{base}/find/")]
            for mname, mdesc in et.desc.methods.items():
                if mname == "__key__":
                    continue
                public = "create" if mname == "__init__" else mname
                self.routes[("POST", f"{base}/{public}")] = self._make_method(
                    name, mname, mdesc
                )

    # -- handlers -----------------------------------------------------------
    def _ping(self, q: dict[str, list[str]]) -> str:
        self.client.ping()
        return "Pong"

    def _make_find(self, entity: str):
        def handler(q: dict[str, list[str]]):
            key = q.get("key", [None])[0]
            if key is None:
                raise _BadRequest("missing required query param: key")
            try:
                self.client.find(entity, key).get()
            except KeyError:
                return f"{self.ns}/{entity} with key = {key} does not exist."
            return {"entity": entity, "key": key}

        return handler

    def _make_method(self, entity: str, mname: str, mdesc: MethodDesc):
        is_init = mname == "__init__"

        def handler(q: dict[str, list[str]]):
            args = []
            for p in mdesc.params:
                if p.name not in q:
                    raise _BadRequest(f"missing required param: {p.name}")
                try:
                    args.append(_coerce(p, q[p.name]))
                except ValueError as exc:
                    # a malformed value is the client's error, not a 500
                    raise _BadRequest(
                        f"invalid value for param {p.name}: {exc}"
                    ) from exc
            if is_init:
                fut: Future = self.client.entity(entity)(*args)
            else:
                key = q.get("key", [None])[0]
                if key is None:
                    raise _BadRequest("missing required query param: key")
                handle = self.client.entity(entity).by_key(key)
                fut = getattr(handle, mname)(*args)
            try:
                return _encode(fut.get())
            except (RuntimeError, KeyError) as exc:
                # reference returns the failure message as the body
                # (fastapi.py:306-309) rather than a 5xx
                return {"error": str(exc)}

        return handler

    # -- WSGI ---------------------------------------------------------------
    @staticmethod
    def _merge_body(params: dict[str, list[str]], raw: bytes) -> None:
        """Merge a JSON body into query-style params (query wins).
        Raises _BadRequest on malformed JSON."""
        try:
            body = json.loads(raw or b"{}")
        except ValueError as exc:
            raise _BadRequest("invalid JSON body") from exc
        if not isinstance(body, dict):
            raise _BadRequest("JSON body must be an object")
        for k, v in body.items():
            params.setdefault(
                k, [str(x) for x in v] if isinstance(v, list) else [str(v)]
            )

    def __call__(self, environ: dict, start_response: Callable) -> Iterable[bytes]:
        method = environ.get("REQUEST_METHOD", "GET").upper()
        path = environ.get("PATH_INFO", "/")
        params = parse_qs(environ.get("QUERY_STRING", ""))
        try:
            clen = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            clen = 0
        if clen and "wsgi.input" in environ:
            try:
                self._merge_body(params, environ["wsgi.input"].read(clen))
            except _BadRequest as exc:
                return self._respond(start_response, 400, {"error": str(exc)})
        handler = self.routes.get((method, path))
        if handler is None:
            return self._respond(
                start_response, 404, {"error": f"no route {method} {path}"}
            )
        try:
            return self._respond(start_response, 200, handler(params))
        except _BadRequest as exc:
            return self._respond(start_response, 400, {"error": str(exc)})
        except Exception as exc:  # engine-side failure
            return self._respond(start_response, 500, {"error": str(exc)})

    @staticmethod
    def _respond(start_response, status: int, payload: Any) -> Iterable[bytes]:
        body = json.dumps(payload).encode()
        reasons = {200: "OK", 400: "Bad Request", 404: "Not Found", 500: "Error"}
        start_response(
            f"{status} {reasons.get(status, 'OK')}",
            [("Content-Type", "application/json"), ("Content-Length", str(len(body)))],
        )
        return [body]

    # -- optional FastAPI adapter ------------------------------------------
    def to_fastapi(self):
        """Build a FastAPI app from the same route table (requires the
        fastapi package; not bundled in this environment)."""
        try:
            from fastapi import FastAPI, HTTPException, Request
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "fastapi is not installed; use the WSGI app directly"
            ) from exc

        app = FastAPI()
        for (http_method, path), handler in self.routes.items():

            async def endpoint(request: Request, _h=handler):  # pragma: no cover
                params = dict(parse_qs(str(request.url.query)))
                body = await request.body()
                try:
                    if body:
                        self._merge_body(params, body)
                    return _h(params)
                except _BadRequest as exc:
                    raise HTTPException(status_code=400, detail=str(exc))

            app.add_api_route(path, endpoint, methods=[http_method])
        return app

    def serve(self, host: str = "127.0.0.1", port: int = 8000):  # pragma: no cover
        """Blocking dev server (stdlib wsgiref)."""
        from wsgiref.simple_server import make_server

        with make_server(host, port, self) as srv:
            srv.serve_forever()


class _BadRequest(Exception):
    pass
