"""HTTP serving-surface parity tests (reference api/app.py:16-382):
route paths, JSON envelope ({data, summary}), display formatting, CSV
attachment, and the allowlist 400 — all through Flask's in-process test
client (no network)."""

from __future__ import annotations

import pytest

flask = pytest.importorskip("flask")

from flu_data_pipeline_spark.api.app import create_app  # noqa: E402


@pytest.fixture(scope="module")
def client(spark):
    app = create_app(spark)
    app.config["TESTING"] = True
    with app.test_client() as c:
        yield c


def test_home_lists_endpoints(client):
    r = client.get("/")
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "running"
    assert "/api/reports/weekly-trends" in body["endpoints"]
    assert "/api/export/csv?table=<table_name>" in body["endpoints"]


def test_health(client):
    r = client.get("/health")
    assert r.status_code == 200
    assert r.get_json()["status"] == "healthy"


def test_weekly_trends_envelope_and_formatting(client):
    r = client.get("/api/reports/weekly-trends")
    assert r.status_code == 200
    body = r.get_json()
    assert set(body) == {"data", "summary"}
    assert body["data"], "report should have rows"
    row = body["data"][0]
    # reference formats avg as "NN.NN%" at the edge (api/app.py:240-243)
    assert row["avg_percent_positive"].endswith("%")
    assert set(body["summary"]) == {"Latest Week", "Avg County %", "Illness Type"}


def test_healthcare_impact_envelope(client):
    r = client.get("/api/reports/healthcare-impact")
    assert r.status_code == 200
    body = r.get_json()
    assert body["data"]
    row = body["data"][0]
    assert row["avg_hospitalization_percent"].endswith("%")
    # ratio formatted to 3dp, density to 1dp (api/app.py:283-291)
    assert "." in row["avg_hospital_to_er_ratio"]
    assert body["summary"]["ACH Regions"] == len(body["data"])
    assert body["summary"]["Total Counties"] > 0


def test_historical_summary_envelope(client):
    r = client.get("/api/reports/historical-summary")
    assert r.status_code == 200
    body = r.get_json()
    assert body["data"]
    assert body["data"][0]["peak_ili_percent"].endswith("%")
    assert body["summary"]["Years Tracked"] == len(body["data"])
    assert body["summary"]["Highest Peak"].endswith("%")


def test_export_csv_ok(client):
    r = client.get("/api/export/csv?table=county_region")
    assert r.status_code == 200
    assert r.mimetype == "text/csv"
    assert "attachment; filename=county_region.csv" in r.headers[
        "Content-Disposition"
    ]
    lines = r.get_data(as_text=True).strip().splitlines()
    assert lines[0].split(",")[0] == "county_id" or "county" in lines[0]
    assert len(lines) > 1


def test_export_csv_rejects_unknown_table(client):
    r = client.get("/api/export/csv?table=users; drop table")
    assert r.status_code == 400
    assert "Invalid table" in r.get_json()["error"]


def test_viewer_serves_dashboard_html(client):
    r = client.get("/viewer")
    assert r.status_code == 200
    html = r.get_data(as_text=True)
    assert "Flu Data Analytics Dashboard" in html
    assert "/api/reports/weekly-trends" in html
