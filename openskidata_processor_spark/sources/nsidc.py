"""Optional concrete NSIDC binding for the snow-cover producer.

``sources.snow.fetch_snow_updates`` takes an injected ``fetch_tile_week``
callable; this module provides the real one, speaking the public NSIDC
DAAC layout the reference's Python client uses
(``snow-cover/src/data_fetcher.py:25-260``):

- archive root ``{base}/VNP10A1F.002/YYYY.MM.DD/`` (one directory per
  acquisition date),
- file pattern ``VNP10A1F.AYYYYDDD.hHHvVV*.h5`` resolved by scraping the
  directory listing (``find_exact_filename``, data_fetcher.py:70-110),
- week index ↔ date per the reference's ``calculate_week_index``
  (``snow-cover/src/utils.py:17-30``): week ``w`` of year ``y`` samples
  ``Jan 1 + 7·w`` days,
- pixel extraction from the two HDF-EOS datasets
  (``CGF_NDSI_Snow_Cover``, ``Cloud_Persistence`` —
  data_fetcher.py:164-233).

Everything network is stdlib ``urllib`` (no requests in this container);
HDF5 extraction needs ``h5py``, gated behind an import-try so the module
imports cleanly anywhere.  Earthdata authentication: pass a bearer
``token`` (the modern Earthdata app token) — the reference instead relies
on ``.netrc`` for ``urs.earthdata.nasa.gov``, which stdlib
``HTTPBasicAuthHandler`` users can wire themselves.  CI never touches
the network: the fake-fetcher tests in ``tests/test_snow_fetch.py``
remain the contract suite; ``tests/test_nsidc.py`` covers the pure parts
(dates, filenames, listing parse) and skip-marks the live path.
"""

from __future__ import annotations

import datetime
import os
import re
import tempfile
import urllib.request

DEFAULT_BASE_URL = "https://n5eil01u.ecs.nsidc.org/VIIRS/VNP10A1F.002"

# data_fetcher.py:164-180,198-214
SNOW_DATASET = ("/HDFEOS/GRIDS/VIIRS_Grid_IMG_2D/Data Fields/"
                "CGF_NDSI_Snow_Cover")
CLOUD_DATASET = ("/HDFEOS/GRIDS/VIIRS_Grid_IMG_2D/Data Fields/"
                 "Cloud_Persistence")


def week_to_date(year: int, week: int) -> datetime.date:
    """Inverse of the reference's ``calculate_week_index`` (utils.py:17):
    week w covers days [7w, 7w+7) from Jan 1; its sample date is day 7w."""
    return datetime.date(year, 1, 1) + datetime.timedelta(days=7 * week)


def filename_pattern(h: int, v: int, date: datetime.date) -> str:
    """``VNP10A1F.AYYYYDDD.hHHvVV`` (data_fetcher.py:52-68)."""
    doy = date.timetuple().tm_yday
    return f"VNP10A1F.A{date.year}{doy:03d}.h{h:02d}v{v:02d}"


def directory_url(date: datetime.date,
                  base_url: str = DEFAULT_BASE_URL) -> str:
    return f"{base_url}/{date.strftime('%Y.%m.%d')}/"


def parse_listing(html: str, base_filename: str) -> str | None:
    """First ``href="{base}*.h5"`` in a DAAC directory listing — the
    reference's regex scrape (data_fetcher.py:93-100)."""
    m = re.findall(rf'href="({re.escape(base_filename)}[^"]+\.h5)"', html)
    return m[0] if m else None


class NSIDCClient:
    """Stdlib-HTTP client for the VNP10A1F archive.  One instance per
    executor task (the fetcher builds it lazily inside the closure, so
    nothing non-picklable crosses the driver→executor boundary)."""

    def __init__(self, base_url: str = DEFAULT_BASE_URL,
                 token: str | None = None,
                 cache_dir: str | None = None,
                 timeout_s: float = 120.0):
        self.base_url = base_url
        self.token = token
        self.cache_dir = cache_dir or tempfile.mkdtemp(prefix="viirs_")
        self.timeout_s = timeout_s

    def _get(self, url: str) -> bytes | None:
        req = urllib.request.Request(url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                if r.status != 200:
                    return None
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def find_exact_url(self, h: int, v: int,
                       date: datetime.date) -> str | None:
        """Directory-listing scrape → exact .h5 URL, or None when the
        tile/date is not published (a legitimate miss, not an error)."""
        dir_url = directory_url(date, self.base_url)
        listing = self._get(dir_url)
        if listing is None:
            return None
        name = parse_listing(listing.decode("utf-8", "replace"),
                             filename_pattern(h, v, date))
        return f"{dir_url}{name}" if name else None

    def download_hdf(self, h: int, v: int,
                     date: datetime.date) -> str | None:
        """Download (or reuse from the run-local cache dir) the HDF for
        (tile, date); None when not published (data_fetcher.py:113-160)."""
        base = filename_pattern(h, v, date)
        for existing in os.listdir(self.cache_dir):
            if existing.startswith(base) and existing.endswith(".h5"):
                return os.path.join(self.cache_dir, existing)
        url = self.find_exact_url(h, v, date)
        if url is None:
            return None
        body = self._get(url)
        if body is None:
            return None
        path = os.path.join(self.cache_dir, url.rsplit("/", 1)[1])
        tmp = path + ".part"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # no truncated files on crash
        return path


def extract_pixels(hdf_path: str,
                   pixels: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """(snow, cloud_persistence) per (row, col) from the two HDF-EOS
    datasets (data_fetcher.py:164-233).  Raises ImportError without h5py
    — the caller's error contract turns that into a retryable 401."""
    import h5py  # gated: not in this container; real deployments have it

    with h5py.File(hdf_path, "r") as f:
        snow_ds = f[SNOW_DATASET]
        cloud_ds = f.get(CLOUD_DATASET)
        out = []
        for row, col in pixels:
            in_bounds = (0 <= row < snow_ds.shape[0]
                         and 0 <= col < snow_ds.shape[1])
            snow = int(snow_ds[row, col]) if in_bounds else 0
            cloud = (int(cloud_ds[row, col])
                     if cloud_ds is not None and in_bounds else 0)
            out.append((snow, cloud))
        return out


def nsidc_fetcher(base_url: str = DEFAULT_BASE_URL,
                  token: str | None = None,
                  cache_dir: str | None = None,
                  timeout_s: float = 120.0):
    """Build the ``fetch_tile_week`` callable for
    ``sources.snow.fetch_snow_updates``.  Lazy: importing/building never
    touches the network; the client materializes on first call inside
    the executor task."""
    state: dict = {}

    def fetch(h: int, v: int, year: int, week: int,
              pixels: list[tuple[int, int]]):
        client = state.get("client")
        if client is None:
            client = state["client"] = NSIDCClient(
                base_url, token, cache_dir, timeout_s)
        path = client.download_hdf(h, v, week_to_date(year, week))
        if path is None:
            return None  # tile not published → snow.py caches 301/400
        return extract_pixels(path, pixels)

    return fetch
