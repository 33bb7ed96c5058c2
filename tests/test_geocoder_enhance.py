"""enhancePhoton parity — the 10 geocode-enhancement vectors of the
reference's Geocoder.unit.test.ts (:119-329), run against the pure
``enhance_photon`` function (no Spark, no network).

The remaining Geocoder vectors (memory/disk caching, request retry,
error budget) are covered by tests/test_enrichment.py and
tests/test_cli.py over the cache-join plumbing.
"""

from __future__ import annotations

from openskidata_processor_spark.sources.fetch import enhance_photon


def props(countrycode=None, state=None, county=None, city=None):
    """mockPhotonGeocode(country, state, county, city) — photon top-feature
    properties with only the populated keys present."""
    out = {}
    if countrycode is not None:
        out["countrycode"] = countrycode
    if state is not None:
        out["state"] = state
    if county is not None:
        out["county"] = county
    if city is not None:
        out["city"] = city
    return out


def test_no_data_is_null():
    assert enhance_photon(None) is None
    assert enhance_photon({}) is None


def test_only_country():
    assert enhance_photon(props("DE")) == {
        "iso3166_1": "DE", "iso3166_2": None, "country": "Germany",
        "region": None, "locality": None}


def test_without_city_state_resolves_region():
    # county "Landkreis Garmisch-Partenkirchen" is not a db region; the
    # state resolves first anyway
    assert enhance_photon(
        props("DE", "Bavaria", "Landkreis Garmisch-Partenkirchen")) == {
        "iso3166_1": "DE", "iso3166_2": "DE-BY", "country": "Germany",
        "region": "Bavaria", "locality": None}


def test_full_geocode():
    assert enhance_photon(
        props("DE", "Bavaria", "Landkreis Garmisch-Partenkirchen",
              "Mittenwald")) == {
        "iso3166_1": "DE", "iso3166_2": "DE-BY", "country": "Germany",
        "region": "Bavaria", "locality": "Mittenwald"}


def test_us_geocode():
    assert enhance_photon(
        props("US", "California", "Placer County", "Alpine Meadows")) == {
        "iso3166_1": "US", "iso3166_2": "US-CA",
        "country": "United States", "region": "California",
        "locality": "Alpine Meadows"}


def test_kosovo_hardcoded_entry():
    # XK is absent from the iso3166-2 dataset (Geocoder.ts:284-301)
    assert enhance_photon(
        props("XK", None, "District of Ferizaj",
              "Municipality of Štrpce")) == {
        "iso3166_1": "XK", "iso3166_2": None, "country": "Kosovo",
        "region": None, "locality": "Municipality of Štrpce"}


def test_czechia_county_fallback():
    # state "Northeast" is not a db region → county resolves instead
    assert enhance_photon(
        props("CZ", "Northeast", "Liberec Region", "Vítkovice")) == {
        "iso3166_1": "CZ", "iso3166_2": "CZ-LI",
        "country": "Czech Republic", "region": "Liberec Region",
        "locality": "Vítkovice"}


def test_japan_numeric_region_code():
    assert enhance_photon(
        props("JP", "Shimane Prefecture", None, "Hamada")) == {
        "iso3166_1": "JP", "iso3166_2": "JP-32", "country": "Japan",
        "region": "Shimane Prefecture", "locality": "Hamada"}


def test_invalid_country_is_null():
    assert enhance_photon(props("DEUS")) is None


def test_invalid_region_keeps_country_nulls_region():
    assert enhance_photon(props("DE", "British Columbia")) == {
        "iso3166_1": "DE", "iso3166_2": None, "country": "Germany",
        "region": None, "locality": None}


def test_custom_region_db_overrides_builtin():
    db = {"ZZ": {"iso": "ZZ", "name": "Testland",
                 "regions": [{"name": "North", "iso": "NO"}]}}
    assert enhance_photon(props("ZZ", "North"), region_db=db) == {
        "iso3166_1": "ZZ", "iso3166_2": "ZZ-NO", "country": "Testland",
        "region": "North", "locality": None}
    # a custom db does not silently fall back to the builtin
    assert enhance_photon(props("DE"), region_db=db) is None
