"""NSIDC binding tests: the pure layers (week math, filename pattern,
listing parse, cache reuse) run in CI; the live-network path is
env-gated (the fake-fetcher suite in test_snow_fetch.py remains the
CI contract for the Spark stage)."""

from __future__ import annotations

import datetime
import os

import pytest

from openskidata_processor_spark.sources import nsidc


def test_week_date_roundtrip():
    """week_to_date inverts the reference's calculate_week_index
    ((date - Jan1).days // 7, utils.py:17-30) for every week."""
    for year in (2023, 2024):
        for week in range(0, 52):
            d = nsidc.week_to_date(year, week)
            assert (d - datetime.date(year, 1, 1)).days // 7 == week


def test_filename_pattern_reference_shape():
    # data_fetcher.py:52-68: VNP10A1F.AYYYYDDD.hHHvVV
    assert (nsidc.filename_pattern(18, 4, datetime.date(2024, 2, 1))
            == "VNP10A1F.A2024032.h18v04")
    assert (nsidc.filename_pattern(9, 11, datetime.date(2023, 1, 1))
            == "VNP10A1F.A2023001.h09v11")


def test_directory_url_layout():
    assert nsidc.directory_url(datetime.date(2024, 2, 1), "https://x/V.002") \
        == "https://x/V.002/2024.02.01/"


def test_parse_listing():
    base = "VNP10A1F.A2024032.h18v04"
    html = (f'<a href="{base}.002.2024033064559.h5">x</a>\n'
            f'<a href="{base}.002.2024033064559.h5.xml">meta</a>\n'
            '<a href="VNP10A1F.A2024032.h19v04.002.x.h5">other tile</a>')
    assert nsidc.parse_listing(html, base) == f"{base}.002.2024033064559.h5"
    assert nsidc.parse_listing("<html></html>", base) is None
    # regex metacharacters in the base must not widen the match
    assert nsidc.parse_listing(html, "VNP10A1F.A2024032.h18v04"
                               .replace(".", "x")) is None


def test_download_reuses_run_cache(tmp_path):
    """A pre-staged HDF short-circuits the network entirely
    (data_fetcher.py:126-130's glob-before-download)."""
    base = nsidc.filename_pattern(18, 4, nsidc.week_to_date(2024, 4))
    staged = tmp_path / f"{base}.002.x.h5"
    staged.write_bytes(b"hdf-bytes")
    client = nsidc.NSIDCClient(base_url="https://unreachable.invalid",
                               cache_dir=str(tmp_path))
    got = client.download_hdf(18, 4, nsidc.week_to_date(2024, 4))
    assert got == str(staged)


def test_fetcher_is_lazy():
    """Building the fetcher must not construct a client or touch the
    network — it's shipped inside a pandas-UDF closure."""
    f = nsidc.nsidc_fetcher(base_url="https://unreachable.invalid")
    assert callable(f)


@pytest.mark.skipif(not os.environ.get("NSIDC_NETWORK_TESTS"),
                    reason="live NSIDC access needs network + Earthdata "
                           "token (set NSIDC_NETWORK_TESTS=1)")
def test_live_listing_probe():  # pragma: no cover
    client = nsidc.NSIDCClient(token=os.environ.get("EARTHDATA_TOKEN"))
    url = client.find_exact_url(18, 4, datetime.date(2024, 2, 1))
    assert url is None or url.endswith(".h5")


class TestLocalHTTPArchive:
    """The full client path against a LOCAL stdlib http.server standing in
    for the DAAC archive: listing scrape, download, run-cache reuse,
    unpublished-date miss, and the Authorization header — the network
    contract tested without the network (the live probe above stays
    env-gated for real-archive drift)."""

    @pytest.fixture()
    def archive(self, tmp_path):
        import http.server
        import threading

        from openskidata_processor_spark.sources.nsidc import (
            filename_pattern, week_to_date)

        date = week_to_date(2024, 3)
        name = filename_pattern(12, 4, date) + ".002.2024032104532.h5"
        body = b"\x89HDF-fake-bytes"
        listing = (f'<html><a href="junk.xml">x</a>'
                   f'<a href="{name}">{name}</a></html>').encode()
        dirpart = f"/{date.strftime('%Y.%m.%d')}/"
        seen = {"auth": [], "paths": []}

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                seen["auth"].append(self.headers.get("Authorization"))
                seen["paths"].append(self.path)
                if self.path == dirpart:
                    payload = listing
                elif self.path == dirpart + name:
                    payload = body
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield {"url": f"http://127.0.0.1:{srv.server_address[1]}",
               "date": date, "name": name, "body": body, "seen": seen,
               "cache": str(tmp_path / "cache")}
        srv.shutdown()

    def test_find_download_cache_and_miss(self, archive, tmp_path):
        import datetime

        from openskidata_processor_spark.sources.nsidc import NSIDCClient
        os.makedirs(archive["cache"], exist_ok=True)
        c = NSIDCClient(base_url=archive["url"], token="tok-123",
                        cache_dir=archive["cache"], timeout_s=10)
        url = c.find_exact_url(12, 4, archive["date"])
        assert url is not None and url.endswith(archive["name"])

        path = c.download_hdf(12, 4, archive["date"])
        assert path is not None and os.path.basename(path) == archive["name"]
        with open(path, "rb") as fh:
            assert fh.read() == archive["body"]

        n_before = len(archive["seen"]["paths"])
        assert c.download_hdf(12, 4, archive["date"]) == path
        assert len(archive["seen"]["paths"]) == n_before  # cache hit, no HTTP

        # unpublished date -> listing 404 -> clean miss
        assert c.download_hdf(12, 4, datetime.date(2024, 6, 1)) is None
        # bearer token rode along on every request
        assert set(archive["seen"]["auth"]) == {"Bearer tok-123"}
