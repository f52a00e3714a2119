"""SharePoint / Microsoft-365 Graph file source (SURVEY §2.1 S7, §2.2 P6).

Re-expresses the reference's SPListClient
(reference: elt-common/src/elt_common/sources/m365/client.py:51-164):
site-URL → drive-id resolution, recursive ``children`` listing with OData
``@odata.nextLink`` paging and ``$select`` pruning, glob filtering
(fnmatch→regex over full paths), tz-aware ``modified_after`` filtering and
content download.

Transport is injectable (``get(url, params) -> dict`` / ``get_bytes``):
production wires OAuth2 client-credentials via ``requests``; tests wire a
canned Graph-response fake (the reference tests do exactly this with
graph-responses.json). Driver-side enumeration is inherent to the Graph
API; the Spark pattern is: ``glob()`` → work-item DataFrame →
download+parse on executors (see ``files_dataframe`` /
``download_to_rows``), so only listing — not file IO — runs on the driver.
"""

from __future__ import annotations

import datetime as dt
import fnmatch
import re
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from urllib import parse as urlparser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GRAPH_API = "https://graph.microsoft.com/v1.0"

GetJson = Callable[[str, dict | None], dict]
GetBytes = Callable[[str], bytes]

# Graph throttles recursive listings aggressively; the reference client
# retries these with exponential backoff (reference:
# elt-common/src/elt_common/sources/m365/client.py:17-31, tenacity).
RETRYABLE_STATUS = frozenset({429, 500, 502, 503, 504})


def request_with_retries(
    send: Callable[[], object],
    *,
    refresh: Callable[[], None] | None = None,
    max_attempts: int = 5,
    base_delay: float = 0.5,
    max_delay: float = 60.0,
    sleep: Callable[[float], None] = time.sleep,
):
    """One Graph request with 401 token refresh + bounded exponential backoff.

    ``send()`` performs a single HTTP attempt and returns a response with
    ``status_code`` / ``headers`` / ``raise_for_status()``. On 401 the
    cached token is dropped via ``refresh()`` and the request retried once
    (token expiry, not an error). On 429/5xx the wait honors ``Retry-After``
    when the server sends one, else ``base_delay * 2**attempt`` capped at
    ``max_delay``; after ``max_attempts`` the last response's
    ``raise_for_status()`` propagates. Any other status returns (or raises)
    immediately.
    """
    refreshed = False
    resp = None
    for attempt in range(max_attempts):
        resp = send()
        status = getattr(resp, "status_code", None)
        if status == 401 and refresh is not None and not refreshed:
            refresh()
            refreshed = True
            continue
        if status in RETRYABLE_STATUS:
            if attempt < max_attempts - 1:
                retry_after = (getattr(resp, "headers", None) or {}).get("Retry-After")
                try:
                    delay = min(float(retry_after), max_delay)
                except (TypeError, ValueError):
                    delay = min(base_delay * 2**attempt, max_delay)
                sleep(delay)
            continue
        resp.raise_for_status()
        return resp
    resp.raise_for_status()
    return resp  # pragma: no cover — unreachable unless raise_for_status no-ops


@dataclass(frozen=True)
class M365File:
    name: str
    path: str
    last_modified: dt.datetime

    @classmethod
    def from_graph_item(cls, item: dict, parent_path: str) -> "M365File":
        return cls(
            name=item["name"],
            path=f"{parent_path}/{item['name']}",
            last_modified=dt.datetime.fromisoformat(item["lastModifiedDateTime"]),
        )


def oauth2_transport(
    tenant_id: str,
    client_id: str,
    client_secret: str,
    *,
    max_attempts: int = 5,
    sleep: Callable[[float], None] = time.sleep,
    http=None,
) -> tuple[GetJson, GetBytes]:
    """Production transport: OAuth2 client-credentials against MS Graph.

    Token fetch + bearer header via requests (the stdlib-free equivalent of
    the reference's authlib OAuth2Client). Both ``get_json`` and
    ``get_bytes`` go through :func:`request_with_retries`: cached token
    dropped + re-fetched on 401, 429/5xx retried with exponential backoff
    honoring ``Retry-After``. ``http``/``sleep`` are injectable for tests
    (``http`` needs ``get``/``post`` with the requests signature).
    """
    if http is None:
        import requests as http  # noqa: PLC0415 — optional dependency, prod only

    token_url = f"https://login.microsoftonline.com/{tenant_id}/oauth2/v2.0/token"
    state: dict[str, str] = {}

    def _token() -> str:
        if "t" not in state:
            resp = request_with_retries(
                lambda: http.post(
                    token_url,
                    data={
                        "grant_type": "client_credentials",
                        "client_id": client_id,
                        "client_secret": client_secret,
                        "scope": "https://graph.microsoft.com/.default",
                    },
                    timeout=30,
                ),
                max_attempts=max_attempts,
                sleep=sleep,
            )
            state["t"] = resp.json()["access_token"]
        return state["t"]

    def _drop_token() -> None:
        state.pop("t", None)

    def get_json(url: str, params: dict | None = None) -> dict:
        resp = request_with_retries(
            lambda: http.get(
                url,
                params=params,
                headers={"Authorization": f"Bearer {_token()}"},
                timeout=60,
            ),
            refresh=_drop_token,
            max_attempts=max_attempts,
            sleep=sleep,
        )
        return resp.json()

    def get_bytes(url: str) -> bytes:
        resp = request_with_retries(
            lambda: http.get(
                url, headers={"Authorization": f"Bearer {_token()}"}, timeout=300
            ),
            refresh=_drop_token,
            max_attempts=max_attempts,
            sleep=sleep,
        )
        return resp.content

    return get_json, get_bytes


class SharePointClient:
    """Drive listing + download for one SharePoint site."""

    def __init__(self, site_url: str, get_json: GetJson, get_bytes: GetBytes | None = None):
        self._get = get_json
        self._get_bytes = get_bytes
        self.drive_url = f"{GRAPH_API}/drives/{self._resolve_drive_id(site_url)}"

    def _resolve_drive_id(self, site_url: str) -> str:
        parts = urlparser.urlparse(site_url)
        site = self._get(f"{GRAPH_API}/sites/{parts.netloc}:{parts.path}", {"$select": "id"})
        drive = self._get(f"{GRAPH_API}/sites/{site['id']}/drive", {"$select": "id"})
        return drive["id"]

    def _item_url(self, path: str, action: str | None = None) -> str:
        path = path.split("://", 1)[-1].rstrip("/")
        if path and not path.startswith("/"):
            path = "/" + path
        if path:
            path = f":{path}:"
        suffix = f"/{action}" if action else ""
        return f"{self.drive_url}/root{path}{suffix}"

    def read_tree(self, path: str) -> list[M365File]:
        """Recursive listing with OData paging and $select pruning."""
        items: list[dict] = []
        url: str | None = self._item_url(path, "children")
        params: dict | None = {"$select": "name,lastModifiedDateTime,folder"}
        while url is not None:
            page = self._get(url, params)
            items.extend(page.get("value", []))
            url, params = page.get("@odata.nextLink"), None
        files = [M365File.from_graph_item(i, path) for i in items if "folder" not in i]
        for folder in items:
            if "folder" in folder and folder["folder"].get("childCount", 0) > 0:
                files.extend(self.read_tree(f"{path}/{folder['name']}"))
        return files

    def glob(
        self,
        root: str,
        pattern: str | None = None,
        modified_after: dt.datetime | None = None,
    ) -> list[M365File]:
        """P6: glob + modified-after filtering over the recursive listing."""
        if "*" in root:
            raise ValueError(
                "'root' must be a directory path, not a glob; pass the glob as 'pattern'"
            )
        files: list[M365File] = self.read_tree(root)
        if pattern:
            matcher = re.compile(fnmatch.translate(pattern))
            files = [f for f in files if matcher.match(f.path)]
        if modified_after is not None:
            if modified_after.tzinfo is None:
                raise ValueError("modified_after must be timezone-aware")
            files = [f for f in files if f.last_modified > modified_after]
        return files

    def read_file(self, path: str) -> bytes:
        if self._get_bytes is None:
            raise ValueError("no byte transport configured (get_bytes)")
        return self._get_bytes(self._item_url(path, "content"))


# --- Spark integration ----------------------------------------------------


def files_dataframe(spark: SparkSession, files: list[M365File]) -> DataFrame:
    rows = [(f.name, f.path, f.last_modified) for f in files]
    return spark.createDataFrame(rows, "name string, path string, last_modified timestamp")


def download_to_rows(
    work: DataFrame,
    fetch: Callable[[str], bytes],
    parse: Callable[[bytes, str], pd.DataFrame],
) -> DataFrame:
    """Executor-side download+parse over a listing DataFrame.

    ``fetch(path)->bytes`` must be serializable (build the transport inside
    when OAuth state can't ship — tokens don't serialize, re-auth per
    executor is the documented pattern). The first row's parse output fixes
    the schema via a driver-side sample of one file.
    """
    sample = work.select("path").limit(1).collect()
    if not sample:
        raise ValueError("empty work list")
    sample_pdf = parse(fetch(sample[0]["path"]), sample[0]["path"])
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        ", ".join(f"`{c}` {_pd_to_ddl(sample_pdf[c])}" for c in sample_pdf.columns)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [parse(fetch(p), p) for p in pdf["path"]]
            yield pd.concat(frames, ignore_index=True) if frames else sample_pdf.iloc[0:0]

    return work.select("path").mapInPandas(run, schema=schema)


def _pd_to_ddl(series: pd.Series) -> str:
    import pandas.api.types as pt

    if pt.is_datetime64_any_dtype(series):
        return "timestamp"
    if pt.is_integer_dtype(series):
        return "long"
    if pt.is_float_dtype(series):
        return "double"
    if pt.is_bool_dtype(series):
        return "boolean"
    return "string"
