"""--schema contract wiring (r4 VERDICT item 3): YAML load + fail-fast
validation, semantic-type-aware checks in audit_csv, exit-code coupling —
the e2e analog of reference tests/test_schema_validator.py."""

import json
import subprocess
import sys

import pytest

from qualityspark.csv_audit import audit_csv
from qualityspark.schema_contract import load_contract

CONTRACT_YAML = """
columns:
  order_id:
    type: id
    required: true
    not_null: true
    unique: true
  amount:
    type: numeric
    min: 0
    max: 50
  category:
    type: categorical
    allowed_values: [ropa, hogar]
  code:
    type: text
    pattern: "[A-Z]{3}-[0-9]+"
  missing_col:
    type: numeric
    required: true
composite_keys:
  - [order_id, category]
"""


def _csv(tmp_path):
    lines = ["order_id,amount,category,code"]
    cats = ["ropa", "hogar", "electro"]          # 'electro' not allowed
    for i in range(120):
        amt = 75 if i < 6 else i % 40            # 6 rows over max=50
        code = f"ABC-{i}" if i % 10 else f"bad{i}"  # 12 pattern misses
        lines.append(f"ORD-{i % 110:05d},{amt},{cats[i % 3]},{code}")
    p = tmp_path / "s.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def contract(tmp_path_factory):
    p = tmp_path_factory.mktemp("sc") / "contract.yaml"
    p.write_text(CONTRACT_YAML)
    return load_contract(str(p))


@pytest.fixture(scope="module")
def report(spark, contract, tmp_path_factory):
    return audit_csv(spark, _csv(tmp_path_factory.mktemp("sd")),
                     schema=contract)


def test_load_contract_rejects_bad_shapes(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("columns:\n  x:\n    type: florp\n"
                   "    pattern: '(['\n    frobnicate: 1\n")
    with pytest.raises(ValueError) as e:
        load_contract(str(bad))
    msg = str(e.value)
    assert "florp" in msg and "pattern" in msg and "frobnicate" in msg


def test_schema_checks_fire(report):
    by_id = {}
    for r in report["schema_checks"]:
        by_id.setdefault(r["check_id"], []).append(r)
    assert not by_id["SCHEMA_MISSING_COLUMN"][0]["passed"]
    assert by_id["SCHEMA_MISSING_COLUMN"][0]["severity"] == "CRITICAL"
    # 120 rows over 110 distinct ids -> 10 dup ids
    uniq = by_id["SCHEMA_UNIQUE_VIOLATION"][0]
    assert uniq["affected_count"] == 10 and not uniq["passed"]
    rng = by_id["SCHEMA_RANGE_VIOLATION"][0]
    assert rng["affected_count"] == 6 and rng["column"] == "amount"
    allowed = by_id["SCHEMA_ALLOWED_VALUES"][0]
    assert allowed["affected_count"] == 40      # every 'electro' row
    pat = by_id["SCHEMA_PATTERN_VIOLATION"][0]
    assert pat["affected_count"] == 12 and pat["severity"] == "MEDIUM"
    # code detects ID_CANDIDATE (90% match PREFIX-123), so the contract's
    # `type: text` legitimately mismatches — semantic-type comparison
    mism = [r for r in by_id["SCHEMA_TYPE_MISMATCH"]
            if r["column"] == "code"]
    assert mism and not mism[0]["passed"]
    assert "ID_CANDIDATE" in mism[0]["detail"]


def test_schema_violations_raise_exit_code(report):
    assert report["exit_code"] == 2             # CRITICAL missing column
    assert report["issues_by_severity"]["CRITICAL"] >= 1
    recs = {r["rule"] for r in report["recommendations"]}
    assert "SCHEMA_MISSING_COLUMN" in recs


def test_cli_audit_csv_schema_e2e(tmp_path):
    """Full CLI pass: violated contract -> SCHEMA_* in report.json and
    printed exit_code 2; malformed contract dies before session start."""
    csv = _csv(tmp_path)
    contract = tmp_path / "c.yaml"
    contract.write_text(CONTRACT_YAML)
    out = tmp_path / "rep"
    r = subprocess.run(
        [sys.executable, "-m", "qualityspark.cli", "audit-csv",
         "--input", csv, "--schema", str(contract),
         "--output", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert r.returncode == 2, r.stderr[-2000:]
    rep = json.loads((out / "report.json").read_text())
    assert any(not c["passed"] and c["check_id"] == "SCHEMA_MISSING_COLUMN"
               for c in rep["schema_checks"])

    bad = tmp_path / "bad.yaml"
    bad.write_text("columns:\n  x:\n    type: florp\n")
    r2 = subprocess.run(
        [sys.executable, "-m", "qualityspark.cli", "audit-csv",
         "--input", csv, "--schema", str(bad)],
        capture_output=True, text=True, timeout=60, cwd="/root/repo")
    assert r2.returncode != 0
    assert "florp" in r2.stderr
    assert "SparkSession" not in r2.stderr[:200]
