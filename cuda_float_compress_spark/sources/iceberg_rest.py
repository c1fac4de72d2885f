"""Pure-Python Iceberg REST catalog client (no jars, stdlib HTTP only).

Closes the catalog-service read gap the on-disk reader
(sources/iceberg.py) cannot: tables addressed by (namespace, name)
through a catalog service instead of a filesystem path. Implements the
client side of the public Iceberg REST Catalog OpenAPI spec
(iceberg.apache.org/rest-catalog-spec — Apache-2.0):

* ``GET /v1/config`` (optional warehouse handshake; overrides merged)
* ``GET /v1/{prefix}/namespaces`` and ``.../namespaces/{ns}/tables``
  (listing)
* ``GET /v1/{prefix}/namespaces/{ns}/tables/{table}`` -> LoadTableResult:
  the embedded ``metadata`` document (or, when only
  ``metadata-location`` is returned, that file loaded from disk) feeds
  the SAME manifest-list/manifest/data-file walk and snapshot-id /
  timestamp time travel as the path-based reader.
* static ``Authorization: Bearer`` tokens (the OAuth2 token ENDPOINT is
  out of scope — tokens must be obtained out of band; stated limit)

Scope is the READ path over locally-reachable storage: the catalog tells
us WHERE the table lives; data/metadata files still stream through the
local filesystem (an object-store FileIO would slot into _resolve). The
sandbox has no external Iceberg service, so conformance is tested against
an in-process mock server implementing the spec's documented JSON shapes
(tests/test_iceberg.py) — the same fixture-twin strategy as
encode_png/encode_jpeg/write_iceberg_fixture.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from cuda_float_compress_spark.sources.iceberg import (
    data_files_from_metadata,
)


class RestCatalog:
    """Minimal Iceberg REST catalog client.

    ``uri``: service base (e.g. ``http://host:8181``). ``token``: static
    bearer token added to every request. ``prefix``: path prefix; when
    None, ``GET /v1/config`` is consulted for the server's default."""

    def __init__(self, uri: str, token: str | None = None,
                 prefix: str | None = None, warehouse: str | None = None):
        self.uri = uri.rstrip("/")
        self.token = token
        if prefix is None:
            cfg = self._get_optional(
                "/v1/config"
                + (f"?warehouse={urllib.parse.quote(warehouse)}"
                   if warehouse else "")
            )
            merged = {}
            if cfg:
                merged.update(cfg.get("defaults", {}))
                merged.update(cfg.get("overrides", {}))
            prefix = merged.get("prefix", "")
        self.prefix = prefix.strip("/")

    # -- plumbing ----------------------------------------------------------

    def _url(self, path: str) -> str:
        base = f"{self.uri}/v1"
        if self.prefix:
            base += f"/{self.prefix}"
        return base + path

    def _get(self, url: str) -> dict:
        req = urllib.request.Request(url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            detail = ""
            try:
                detail = e.read().decode("utf-8", "replace")[:200]
            except Exception:
                pass
            raise ValueError(
                f"iceberg REST catalog error {e.code} for {url}: {detail}"
            ) from e
        except urllib.error.URLError as e:
            raise ValueError(
                f"iceberg REST catalog unreachable at {url}: {e.reason}"
            ) from e

    def _get_optional(self, path: str) -> dict | None:
        try:
            return self._get(f"{self.uri}{path}")
        except ValueError:
            return None

    # -- catalog surface ---------------------------------------------------

    def list_namespaces(self) -> list[tuple[str, ...]]:
        out = self._get(self._url("/namespaces"))
        return [tuple(ns) for ns in out.get("namespaces", [])]

    def list_tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace, safe="")
        out = self._get(self._url(f"/namespaces/{ns}/tables"))
        return [t["name"] for t in out.get("identifiers", [])]

    def load_table(self, namespace: str, table: str) -> dict:
        """LoadTableResult -> (metadata dict, table location). Prefers the
        embedded ``metadata`` document; falls back to reading
        ``metadata-location`` from local storage."""
        ns = urllib.parse.quote(namespace, safe="")
        t = urllib.parse.quote(table, safe="")
        out = self._get(self._url(f"/namespaces/{ns}/tables/{t}"))
        meta = out.get("metadata")
        if meta is None:
            loc = out.get("metadata-location")
            if not loc:
                raise ValueError(
                    "LoadTableResult carries neither metadata nor "
                    "metadata-location"
                )
            from cuda_float_compress_spark.sources.iceberg import (
                _strip_scheme,
            )

            with open(_strip_scheme(loc)) as f:
                meta = json.load(f)
        return meta


def read_iceberg_rest(
    spark: SparkSession,
    uri: str,
    namespace: str,
    table: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    token: str | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Read an Iceberg table through a REST catalog service (no jars):
    catalog request -> TableMetadata -> manifest walk -> parquet scan,
    with the same snapshot-id / timestamp time travel as
    :func:`read_iceberg_dir`."""
    from cuda_float_compress_spark.sources.iceberg import _strip_scheme

    cat = RestCatalog(uri, token=token, prefix=prefix)
    meta = cat.load_table(namespace, table)
    table_dir = _strip_scheme(str(meta.get("location", "")))
    files = data_files_from_metadata(meta, table_dir, snapshot_id, as_of_ms)
    if not files:
        raise ValueError(
            f"snapshot has no data files in {namespace}.{table}"
        )
    return spark.read.parquet(*files)
