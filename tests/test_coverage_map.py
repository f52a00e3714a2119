"""Machine-checkable SURVEY §2 coverage map (no Spark session).

``tests/coverage_map.json`` maps every operator ID in SURVEY.md §2 to its
implementation anchor and the thing that verifies it. This test keeps the
map honest in both directions: every §2 ID must be mapped, every mapped
path must exist, and every symbol must actually appear in that file — so
a refactor that moves or deletes an implementation breaks the claim loudly
instead of leaving stale documentation.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MAP = json.loads((ROOT / "tests/coverage_map.json").read_text())


def _survey_ids() -> list[str]:
    s = (ROOT / "SURVEY.md").read_text()
    sec2 = s[s.index("## 2. Operator inventory") : s.index("## 3. Query lifecycle")]
    return re.findall(r"^\| ([A-Z]+\d+[a-z]?) \|", sec2, re.M)


def test_every_survey_id_is_mapped():
    ids = _survey_ids()
    assert ids, "could not parse SURVEY §2"
    missing = sorted(set(ids) - set(MAP))
    stale = sorted(set(MAP) - set(ids))
    assert not missing, f"SURVEY §2 ids with no coverage-map entry: {missing}"
    assert not stale, f"coverage-map entries not in SURVEY §2: {stale}"


def test_every_anchor_exists():
    offenders = []
    for op_id, entry in sorted(MAP.items()):
        path = ROOT / entry["impl"]
        if not path.exists():
            offenders.append(f"{op_id}: missing file {entry['impl']}")
            continue
        if entry.get("symbol") and entry["symbol"] not in path.read_text():
            offenders.append(
                f"{op_id}: symbol {entry['symbol']!r} not found in {entry['impl']}"
            )
    assert not offenders, offenders


def test_every_entry_names_its_verification():
    empty = [k for k, v in MAP.items() if not v.get("verified_by", "").strip()]
    assert not empty, f"coverage-map entries with no verification note: {empty}"


VAGUE = {"def ", "class ", "max", "count", "IN", "replace", "limit", "dedup"}


def test_anchors_are_specific():
    """A symbol that matches any Python file verifies nothing — reject the
    vague anchors that made the first version of this map unfalsifiable."""
    offenders = [
        f"{k}: {v['symbol']!r}"
        for k, v in MAP.items()
        if v["symbol"].strip() in VAGUE or len(v["symbol"].strip()) < 4
    ]
    assert not offenders, f"unfalsifiable coverage anchors: {offenders}"
