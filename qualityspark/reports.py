"""Human report sinks (reference core/report_builder.py:22-146 +
generate_report_{md,html,executive}.py analogs).

All reports render from the tiny collected metrics row + top-lineage
aggregates — never from raw data (driver-side work stays O(rules), the
tables stay distributed).  Formats: json, md, txt, html; xlsx is
import-gated like the reference's optional deps (openpyxl absent here)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityspark import constants as C


def build_report(metrics_row: dict, top_rules: list[dict],
                 run_id: str = "run0") -> dict:
    n = max(metrics_row.get("n_docs", 0), 1)
    rules = []
    for rule, sev in C.DOC_RULES:
        cnt = metrics_row.get(f"n_{rule}", 0)
        if cnt:
            rules.append({"rule": rule, "severity": sev,
                          "affected_count": int(cnt),
                          "affected_pct": round(cnt / n, 4)})
    rules.sort(key=lambda r: (C.SEVERITIES.index(r["severity"]),
                              -r["affected_count"]))
    issues_by_severity = {s: 0 for s in ("CRITICAL", "HIGH", "MEDIUM",
                                         "LOW", "INFO")}
    for r in rules:
        issues_by_severity[r["severity"]] += r["affected_count"]
    score = round(float(metrics_row.get("avg_score", 0.0)), 1)
    return {
        "run_id": run_id,
        "n_docs": int(metrics_row.get("n_docs", 0)),
        "keep_rate": round(float(metrics_row.get("keep_rate", 0.0)), 4),
        "avg_score": score,
        "grade": C.grade_from_score(score),
        "issues_by_severity": issues_by_severity,
        "rules": rules,
        "top_flagged": top_rules,
    }


def to_markdown(report: dict) -> str:
    lines = [f"# Quality audit — {report['run_id']}", "",
             f"- documents: **{report['n_docs']:,}**",
             f"- keep rate: **{report['keep_rate']:.1%}**",
             f"- average score: **{report['avg_score']}** "
             f"(grade {report['grade']})", "",
             "| rule | severity | affected | pct |", "|---|---|---|---|"]
    for r in report["rules"]:
        lines.append(f"| {r['rule']} | {r['severity']} | "
                     f"{r['affected_count']:,} | {r['affected_pct']:.2%} |")
    return "\n".join(lines) + "\n"


def to_text(report: dict) -> str:
    out = [f"QUALITY AUDIT {report['run_id']}",
           f"docs={report['n_docs']} keep={report['keep_rate']:.1%} "
           f"score={report['avg_score']} grade={report['grade']}"]
    for r in report["rules"]:
        out.append(f"  [{r['severity']:8s}] {r['rule']:28s} "
                   f"{r['affected_count']:>8,} ({r['affected_pct']:.2%})")
    return "\n".join(out) + "\n"


def to_html(report: dict) -> str:
    rows = "".join(
        f"<tr><td>{r['rule']}</td><td>{r['severity']}</td>"
        f"<td>{r['affected_count']:,}</td><td>{r['affected_pct']:.2%}</td>"
        f"</tr>" for r in report["rules"])
    return (f"<html><head><title>{report['run_id']}</title></head><body>"
            f"<h1>Quality audit — {report['run_id']}</h1>"
            f"<p>docs: {report['n_docs']:,} · keep {report['keep_rate']:.1%}"
            f" · score {report['avg_score']} (grade {report['grade']})</p>"
            f"<table border=1><tr><th>rule</th><th>severity</th>"
            f"<th>affected</th><th>pct</th></tr>{rows}</table>"
            f"</body></html>")


def executive_summary(report: dict) -> str:
    """Exec summary (reference generate_report_executive.py:22-130 analog):
    verdict + top findings in prose."""
    crit = report["issues_by_severity"]["CRITICAL"]
    verdict = ("NOT USABLE — critical issues" if crit
               else ("USABLE WITH FIXES"
                     if report["avg_score"] < 90 else "HEALTHY"))
    top = report["rules"][:5]
    lines = [f"Verdict: {verdict}",
             f"{report['n_docs']:,} documents audited; "
             f"{report['keep_rate']:.1%} kept; average score "
             f"{report['avg_score']} (grade {report['grade']}).",
             "Top findings:"]
    for r in top:
        lines.append(f"  - {r['rule']} ({r['severity']}): "
                     f"{r['affected_pct']:.2%} of documents")
    return "\n".join(lines) + "\n"


def xlsx_sheets(report: dict) -> list[tuple[str, list[list]]]:
    """Workbook content as (sheet_name, rows) pairs — the per-document
    analog of the reference's Resumen / Por Columna / Issues sheets
    (generate_report_excel.py:39-318).  Pure data, so the sheet layout is
    unit-tested even where openpyxl is absent and to_xlsx only handles
    the library calls."""
    summary = [["Quality audit", report["run_id"]],
               ["documents", report["n_docs"]],
               ["keep rate", report["keep_rate"]],
               ["average score", report["avg_score"]],
               ["grade", report["grade"]],
               [],
               ["severity", "affected"]]
    for sev, cnt in report["issues_by_severity"].items():
        summary.append([sev, cnt])
    rules = [["rule", "severity", "affected", "pct"]]
    for r in report["rules"]:
        rules.append([r["rule"], r["severity"], r["affected_count"],
                      r["affected_pct"]])
    flagged = [["rule", "severity", "count"]]
    for r in report.get("top_flagged", []):
        flagged.append([r.get("rule"), r.get("severity"), r.get("n")])
    return [("Summary", summary), ("Rules", rules), ("Top flagged", flagged)]


def to_xlsx(report: dict, path: str) -> bool:
    """Write the workbook when openpyxl is available (the reference treats
    it as an optional dependency too); returns False when gated off."""
    try:
        import openpyxl
    except ImportError:
        return False
    wb = openpyxl.Workbook()
    wb.remove(wb.active)
    for name, rows in xlsx_sheets(report):
        ws = wb.create_sheet(name)
        for row in rows:
            ws.append(row if row else [None])
    wb.save(path)
    return True


def write_reports(spark: SparkSession, audited: DataFrame, out_dir: str,
                  run_id: str = "run0") -> dict:
    """All sinks from one metrics pass.  xlsx is import-gated (reference
    makes openpyxl optional too)."""
    from qualityspark.scoring import metrics_table, lineage_table
    metrics = metrics_table(audited, run_id).first().asDict()
    top = [r.asDict() for r in
           (lineage_table(audited).groupBy("rule", "severity")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n")).limit(20).collect())]
    report = build_report(metrics, top, run_id)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, content in [
            ("report.json", json.dumps(report, indent=2)),
            ("report.md", to_markdown(report)),
            ("report.txt", to_text(report)),
            ("report.html", to_html(report)),
            ("executive_summary.txt", executive_summary(report))]:
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(content)
        paths[name] = p
    xp = os.path.join(out_dir, "report.xlsx")
    paths["report.xlsx"] = (xp if to_xlsx(report, xp)
                            else "skipped: openpyxl not installed")
    return {"report": report, "paths": paths}
