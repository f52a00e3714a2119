"""M365/SharePoint client tests against a canned Graph-response fake —
the reference's test strategy (graph-responses.json, sources/test_m365.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from analytics_data_platform_spark.sources import m365

UTC = dt.timezone.utc


def _file(name, modified):
    return {"name": name, "lastModifiedDateTime": modified}


def _folder(name, children):
    return {"name": name, "folder": {"childCount": children}}


class FakeGraph:
    """Canned Graph API: site→drive resolution, paged children listings."""

    def __init__(self):
        self.calls: list[str] = []
        base = "https://graph.microsoft.com/v1.0"
        drive = f"{base}/drives/drv-1/root"
        self.responses = {
            f"{base}/sites/contoso.sharepoint.com:/sites/ops": {"id": "site-1"},
            f"{base}/sites/site-1/drive": {"id": "drv-1"},
            f"{drive}:/reports:/children": {
                "value": [
                    _file("jan.csv", "2024-01-31T10:00:00+00:00"),
                    _file("feb.csv", "2024-02-29T10:00:00+00:00"),
                    _folder("archive", 2),
                    _folder("empty", 0),
                ],
                "@odata.nextLink": f"{drive}:/reports:/children?page=2",
            },
            f"{drive}:/reports:/children?page=2": {
                "value": [_file("mar.xlsx", "2024-03-31T10:00:00+00:00")]
            },
            f"{drive}:/reports/archive:/children": {
                "value": [
                    _file("old1.csv", "2020-01-01T00:00:00+00:00"),
                    _file("old2.csv", "2020-06-01T00:00:00+00:00"),
                ]
            },
        }

    def get_json(self, url: str, params: dict | None = None) -> dict:
        self.calls.append(url)
        if url not in self.responses:
            raise KeyError(f"unexpected Graph call: {url}")
        return self.responses[url]

    def get_bytes(self, url: str) -> bytes:
        self.calls.append(url)
        name = url.split("/")[-2].rstrip(":").split("/")[-1]
        return f"data,of\n1,{name}\n".encode()


@pytest.fixture()
def client():
    fake = FakeGraph()
    c = m365.SharePointClient(
        "https://contoso.sharepoint.com/sites/ops", fake.get_json, fake.get_bytes
    )
    return c, fake


def test_drive_resolution_and_recursive_paged_listing(client):
    c, fake = client
    files = c.read_tree("/reports")
    names = sorted(f.name for f in files)
    assert names == ["feb.csv", "jan.csv", "mar.xlsx", "old1.csv", "old2.csv"]
    # paging followed; empty folder NOT recursed into
    assert any("page=2" in u for u in fake.calls)
    assert not any("/reports/empty:" in u for u in fake.calls)
    # full paths preserved
    assert {f.path for f in files if "old" in f.name} == {
        "/reports/archive/old1.csv",
        "/reports/archive/old2.csv",
    }


def test_glob_pattern_and_modified_after(client):
    c, _ = client
    assert {f.name for f in c.glob("/reports", pattern="*.csv")} == {
        "jan.csv", "feb.csv", "old1.csv", "old2.csv",
    }
    recent = c.glob(
        "/reports", pattern="*.csv", modified_after=dt.datetime(2024, 1, 1, tzinfo=UTC)
    )
    assert {f.name for f in recent} == {"jan.csv", "feb.csv"}
    with pytest.raises(ValueError, match="directory path, not a glob"):
        c.glob("/reports/*.csv")
    with pytest.raises(ValueError, match="timezone-aware"):
        c.glob("/reports", modified_after=dt.datetime(2024, 1, 1))


def test_read_file_content(client):
    c, _ = client
    assert c.read_file("/reports/jan.csv").startswith(b"data,of")


def test_download_to_rows_distributed(spark, client):
    c, fake = client
    files = c.glob("/reports", pattern="*.csv", modified_after=dt.datetime(2024, 1, 1, tzinfo=UTC))
    work = m365.files_dataframe(spark, files)
    assert work.count() == 2

    def fetch(path: str) -> bytes:
        return f"v\n{len(path)}\n".encode()

    def parse(content: bytes, path: str) -> pd.DataFrame:
        df = pd.read_csv(pd.io.common.BytesIO(content))
        df["file"] = path
        return df

    out = m365.download_to_rows(work, fetch, parse)
    rows = out.collect()
    assert len(rows) == 2
    assert {r["file"] for r in rows} == {f.path for f in files}
    assert all(r["v"] == len(r["file"]) for r in rows)


# --- retry/backoff transport (reference client.py:17-31 tenacity parity) ---


class FakeResponse:
    def __init__(self, status, json_body=None, content=b"", headers=None):
        self.status_code = status
        self.headers = headers or {}
        self._json = json_body or {}
        self.content = content

    def json(self):
        return self._json

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


class FakeHttp:
    """requests-shaped double: pops one scripted response per call."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def _next(self, kind, url):
        self.calls.append((kind, url))
        if not self.script:
            raise AssertionError(f"unscripted {kind} {url}")
        return self.script.pop(0)

    def get(self, url, **kw):
        return self._next("get", url)

    def post(self, url, **kw):
        return self._next("post", url)


TOKEN = FakeResponse(200, {"access_token": "tok"})


def _transport(script, sleeps=None):
    http = FakeHttp(script)
    sleeps = [] if sleeps is None else sleeps
    gj, gb = m365.oauth2_transport(
        "tid", "cid", "secret", http=http, sleep=sleeps.append
    )
    return gj, gb, http, sleeps


def test_retry_429_then_success_honors_retry_after():
    sleeps = []
    gj, _, http, _ = _transport(
        [
            TOKEN,
            FakeResponse(429, headers={"Retry-After": "2"}),
            FakeResponse(429),  # no header -> exponential backoff
            FakeResponse(200, {"ok": True}),
        ],
        sleeps,
    )
    assert gj("https://x/items") == {"ok": True}
    assert sleeps == [2.0, 0.5 * 2**1]
    assert len(http.calls) == 4  # token + 3 attempts


def test_retry_exhausted_on_persistent_500():
    gj, _, http, sleeps = _transport([TOKEN] + [FakeResponse(500)] * 5)
    with pytest.raises(RuntimeError, match="HTTP 500"):
        gj("https://x/items")
    assert len(http.calls) == 6  # token + max_attempts
    assert sleeps == [0.5, 1.0, 2.0, 4.0]  # no sleep after the last attempt


def test_get_bytes_refreshes_token_on_401():
    """get_bytes previously had NO 401 refresh — downloads died on expiry."""
    _, gb, http, _ = _transport(
        [
            TOKEN,
            FakeResponse(401),
            FakeResponse(200, {"access_token": "tok2"}),  # re-auth
            FakeResponse(200, content=b"payload"),
        ]
    )
    assert gb("https://x/content") == b"payload"
    kinds = [k for k, _ in http.calls]
    assert kinds == ["post", "get", "post", "get"]


def test_second_401_raises_not_loops():
    gj, *_ = _transport([TOKEN, FakeResponse(401), TOKEN, FakeResponse(401)])
    with pytest.raises(RuntimeError, match="HTTP 401"):
        gj("https://x/items")


def test_retry_after_caps_at_max_delay():
    sleeps = []
    send_script = [FakeResponse(429, headers={"Retry-After": "3600"}), FakeResponse(200)]
    sc = list(send_script)
    m365.request_with_retries(lambda: sc.pop(0), sleep=sleeps.append, max_delay=60.0)
    assert sleeps == [60.0]
