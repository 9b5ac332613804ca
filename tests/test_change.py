"""Shoreline-change analysis (infer/change.py) — transects, intersections,
position time series, migration rates. Pure host geometry; exact answers
on synthetic shorelines."""

import os

import numpy as np
import pytest

from coastline.infer.change import (
    decimal_year,
    generate_transects,
    shoreline_change,
    shoreline_positions,
    transect_intersections,
)


def test_generate_transects_straight_baseline():
    """Baseline along +x with spacing 10 → stations at x=0,10,20,30;
    'both' transects are vertical, centered, of the requested length."""
    trs = generate_transects([[0, 0], [30, 0]], spacing=10, length=8, side="both")
    assert len(trs) == 4
    xs = [t[0][0] for t in trs]
    assert xs == [0.0, 10.0, 20.0, 30.0]
    for t in trs:
        assert t[0][0] == t[1][0]  # vertical
        assert abs(t[1][1] - t[0][1]) == pytest.approx(8.0)
        assert (t[0][1] + t[1][1]) / 2 == pytest.approx(0.0)  # centered

    left = generate_transects([[0, 0], [30, 0]], spacing=30, length=5, side="left")
    # +90° CCW of +x is +y: origin at the station, end at y=+5
    assert left[0][0] == [0.0, 0.0] and left[0][1] == [0.0, 5.0]
    right = generate_transects([[0, 0], [30, 0]], spacing=30, length=5, side="right")
    assert right[0][1] == [0.0, -5.0]


def test_generate_transects_degenerate_inputs():
    assert generate_transects([[0, 0]], 10, 8) == []
    assert generate_transects([[0, 0], [1, 0]], 0, 8) == []
    assert generate_transects([[0, 0], [0, 0]], 10, 8) == []  # zero length
    # repeated interior vertex must not divide by zero
    trs = generate_transects([[0, 0], [10, 0], [10, 0], [20, 0]], 5, 4)
    assert len(trs) == 5


def test_transect_intersections_chainage():
    """Chainage is distance from the transect ORIGIN; multiple crossings
    return ascending; a miss returns []."""
    tr = [[0, 0], [20, 0]]  # horizontal transect
    shoreline = [[[5, -3], [5, 3]]]  # vertical line at x=5
    assert transect_intersections(tr, shoreline) == [pytest.approx(5.0)]
    two = [[[5, -3], [5, 3]], [[12, -1], [12, 1]]]
    assert transect_intersections(tr, two) == [pytest.approx(5.0), pytest.approx(12.0)]
    assert transect_intersections(tr, [[[50, -3], [50, 3]]]) == []
    # parallel/collinear segments contribute nothing (no unique crossing)
    assert transect_intersections(tr, [[[1, 0], [9, 0]]]) == []
    # a crossing exactly at a shared polyline vertex counts once, not twice
    bent = [[[7, -3], [7, 0], [7, 3]]]
    assert transect_intersections(tr, bent) == [pytest.approx(7.0)]


def test_shoreline_positions_reduce_and_nan():
    trs = [[[0, 0], [20, 0]], [[0, 5], [20, 5]]]
    lines = [[[4, -1], [4, 1]], [[10, -1], [10, 1]], [[16, -1], [16, 1]]]
    med = shoreline_positions(lines, trs, reduce="median")
    assert med[0] == pytest.approx(10.0)  # median of 4/10/16
    assert np.isnan(med[1])  # transect at y=5 misses everything
    assert shoreline_positions(lines, trs, reduce="min")[0] == pytest.approx(4.0)
    assert shoreline_positions(lines, trs, reduce="max")[0] == pytest.approx(16.0)
    with pytest.raises(ValueError):
        shoreline_positions(lines, trs, reduce="mean")


def test_decimal_year():
    assert decimal_year(2020.5) == 2020.5
    assert decimal_year("2021-01-01") == pytest.approx(2021.0)
    # 2021-07-02 = 182 days elapsed of 365
    assert decimal_year("2021-07-02") == pytest.approx(2021 + 182 / 365, abs=1e-9)


def test_shoreline_change_linear_migration():
    """Shoreline advancing 2 units/year is recovered exactly per transect,
    regardless of input date order."""
    trs = generate_transects([[0, 0], [0, 30]], spacing=10, length=40, side="left")
    # baseline along +y; 'left' (+90° CCW of +y) points to -x... verify by origin
    # -> use explicit horizontal transects instead to keep the test readable
    trs = [[[0, y], [30, y]] for y in (0, 10, 20)]

    def shoreline_at(x):
        return [[[x, -5], [x, 25]]]

    series = [
        {"date": 2002.0, "coastlines": shoreline_at(14.0)},
        {"date": 2000.0, "coastlines": shoreline_at(10.0)},  # unsorted on purpose
        {"date": 2001.0, "coastlines": shoreline_at(12.0)},
    ]
    res = shoreline_change(series, trs)
    assert res["dates"] == [2000.0, 2001.0, 2002.0]
    assert np.allclose(res["positions"], [[10.0] * 3, [12.0] * 3, [14.0] * 3])
    assert np.allclose(res["rates"], [2.0, 2.0, 2.0])
    assert res["mean_rate"] == pytest.approx(2.0)
    assert res["n_transects_with_rate"] == 3


def test_shoreline_change_nan_and_insufficient_dates():
    """A transect that misses on some dates still gets a rate from the
    remaining >=2 points; one with <2 dated positions gets NaN."""
    trs = [[[0, 0], [30, 0]], [[0, 50], [30, 50]]]
    series = [
        {"date": 2000.0, "coastlines": [[[10, -5], [10, 5]]]},
        {"date": 2001.0, "coastlines": [[[13, -5], [13, 5]]]},
        # 2002: shoreline also crosses the y=50 transect (its only hit)
        {"date": 2002.0, "coastlines": [[[16, -5], [16, 55]], [[16, 55], [16, 60]]]},
    ]
    res = shoreline_change(series, trs)
    assert res["rates"][0] == pytest.approx(3.0)
    assert np.isnan(res["rates"][1])
    assert res["n_transects_with_rate"] == 1
    # positions row for 2002 transect 1 is the real chainage, not NaN
    assert res["positions"][2][1] == pytest.approx(16.0)


def _write_artifact(path, coastlines, flavor="json", gt=None):
    import json

    if flavor == "json":
        payload = {"image_path": str(path), "image_size": [64, 64],
                   "coastlines": coastlines, "coastline_count": len(coastlines),
                   "dilation_size": 5, "extraction_time": "t"}
    else:
        from coastline.infer.geojson import coastlines_to_geojson

        payload = coastlines_to_geojson(coastlines, gt)
    with open(path, "w") as f:
        json.dump(payload, f)


def test_load_coastlines_artifact_both_flavors(tmp_path):
    from coastline.infer.change import load_coastlines_artifact, year_from_name

    lines = [[[1, 2], [3, 4], [5, 6]]]
    _write_artifact(tmp_path / "a_2020_coastlines.json", lines)
    got, units = load_coastlines_artifact(str(tmp_path / "a_2020_coastlines.json"))
    assert got == lines and units == "px"

    # world = pixel + 0.5 + origin (NOT the identity transform — geojson.py
    # rejects that as the ungeoreferenced-raster sentinel)
    gt = [100.0, 1.0, 0.0, 200.0, 0.0, 1.0]
    _write_artifact(tmp_path / "a_2021_coastlines.geojson", lines, "geojson", gt)
    got, units = load_coastlines_artifact(str(tmp_path / "a_2021_coastlines.geojson"))
    assert units == "m" and got == [[[101.5, 202.5], [103.5, 204.5], [105.5, 206.5]]]

    assert year_from_name("/data/2020/scene_coastlines.json") == 2020.0
    assert year_from_name("scene_1999.json") == 1999.0
    assert year_from_name("scene_3001.json") is None


def test_load_geojson_null_geometry_and_crs_units(tmp_path):
    """RFC 7946 allows 'geometry': null — skip it, don't AttributeError;
    and units come from the recorded CRS (degrees for geographic rasters,
    so deg/yr rates are never mislabelled m/yr)."""
    import json

    from coastline.infer.change import _units_from_crs, load_coastlines_artifact

    fc = {"type": "FeatureCollection",
          "properties": {"crs_wkt": "EPSG:4326"},
          "features": [
              {"type": "Feature", "geometry": None},
              "not-a-feature-object",
              {"type": "Feature",
               "geometry": {"type": "LineString",
                            "coordinates": [[0.0, 1.0], [2.0, 3.0]]}}]}
    p = tmp_path / "a_2020_coastlines.geojson"
    p.write_text(json.dumps(fc))
    lines, units = load_coastlines_artifact(str(p))
    assert lines == [[[0.0, 1.0], [2.0, 3.0]]] and units == "deg"

    assert _units_from_crs(None) == "m"
    assert _units_from_crs('PROJCS["WGS 84 / UTM zone 30N",...]') == "m"
    assert _units_from_crs('GEOGCS["WGS 84",DATUM[...]]') == "deg"
    assert _units_from_crs('GEOGCRS["WGS 84"]') == "deg"

    fc["features"] = {"oops": "not a list"}
    p.write_text(json.dumps(fc))
    import pytest as _pt
    with _pt.raises(ValueError, match="features"):
        load_coastlines_artifact(str(p))


def test_change_cli_end_to_end(tmp_path):
    """Three year-named pixel artifacts -> shoreline_change.json with the
    exact 2 px/yr rate, plus the figure; auto-baseline, auto-dates."""
    import json

    from coastline.cli.change import main

    for yr, x in ((2019, 10.0), (2021, 14.0), (2024, 20.0)):
        _write_artifact(tmp_path / f"scene_{yr}_coastlines.json",
                        [[[x, 0.0], [x, 100.0]]])
    out = tmp_path / "chg"
    rc = main([str(tmp_path / f"scene_{yr}_coastlines.json")
               for yr in (2019, 2021, 2024)]
              + ["--spacing", "25", "--length", "60",
                 "--output-dir", str(out)])
    assert rc == 0
    with open(out / "shoreline_change.json") as f:
        res = json.load(f)
    assert res["units"] == "px"
    assert res["dates"] == [2019.0, 2021.0, 2024.0]
    rates = [r for r in res["rates"] if r is not None]
    assert rates and all(abs(abs(r) - 2.0) < 1e-9 for r in rates)
    assert (out / "shoreline_change.png").exists()


def test_change_cli_rejects_bad_inputs(tmp_path):
    from coastline.cli.change import main

    lines = [[[1.0, 0.0], [1.0, 50.0]]]
    _write_artifact(tmp_path / "a_2020_coastlines.json", lines)
    _write_artifact(tmp_path / "b_2021_coastlines.geojson", lines, "geojson",
                    [100.0, 1.0, 0.0, 200.0, 0.0, 1.0])
    # mixed coordinate flavors
    assert main([str(tmp_path / "a_2020_coastlines.json"),
                 str(tmp_path / "b_2021_coastlines.geojson")]) == 2
    # fewer than 2 inputs
    assert main([str(tmp_path / "a_2020_coastlines.json")]) == 2
    # date count mismatch
    assert main([str(tmp_path / "a_2020_coastlines.json"),
                 str(tmp_path / "a_2020_coastlines.json"),
                 "--dates", "2020"]) == 2
    # no year in the name and no --dates
    _write_artifact(tmp_path / "noyear_coastlines.json", lines)
    assert main([str(tmp_path / "a_2020_coastlines.json"),
                 str(tmp_path / "noyear_coastlines.json")]) == 2
    # corrupt artifact (null payload — e.g. a geojson written from a
    # degenerate geotransform): clean usage error, not AttributeError
    (tmp_path / "bad_2022_coastlines.json").write_text("null")
    assert main([str(tmp_path / "a_2020_coastlines.json"),
                 str(tmp_path / "bad_2022_coastlines.json")]) == 2
    # malformed --dates / --baseline values: usage errors, not tracebacks
    two = [str(tmp_path / "a_2020_coastlines.json")] * 2
    assert main(two + ["--dates", "2020", "garbage"]) == 2
    assert main(two + ["--dates", "2020", "2021",
                       "--baseline", "1,2"]) == 2        # single point
    assert main(two + ["--dates", "2020", "2021",
                       "--baseline", "1,2 x,y"]) == 2    # non-numeric


def test_geo_extraction_to_change_rates_end_to_end(tmp_path, monkeypatch):
    """The full multi-temporal workflow: georeferenced TIF extraction →
    world-space GeoJSON artifacts for two dates → change CLI → migration
    rates in metres/yr. The TIF ingest is patched to supply a geotransform
    (GDAL/rasterio are absent in-container; PIL can't read georef)."""
    import json

    from PIL import Image

    import coastline.infer.extract as extract_mod
    from coastline.cli.change import main as change_main
    from coastline.infer.extract import CoastlineExtractor

    gt = [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]  # 10 m pixels

    ex = CoastlineExtractor(image_size=64)
    outs = []
    for yr, split in ((2019, 24), (2022, 30)):  # waterline moves 6 px in 3 yr
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :split] = 200  # bright land, dark water — content is irrelevant;
        # we patch predict_mask so rates are exact, not model-dependent
        path = str(tmp_path / f"scene_{yr}.tif")
        Image.fromarray(img).save(path)

        def fake_load(self, p, _img=img):
            return Image.fromarray(_img), {"geo_transform": gt,
                                           "projection": "EPSG:32630"}

        monkeypatch.setattr(extract_mod.CoastlineExtractor,
                            "_load_image_meta", fake_load)
        mask = np.zeros((64, 64), np.uint8)
        for r in range(64):  # jagged waterline: straight 1-px bands compress
            mask[r, split + (r % 4):] = 1  # to <=10-pt contours and get dropped
        monkeypatch.setattr(ex, "predict_mask", lambda im, _m=mask: _m)
        out = str(tmp_path / f"out_{yr}")
        res = ex.extract_coastline_from_image(path, output_dir=out,
                                              dilation_size=3)
        assert res is not None and res["geo_transform"] == gt
        gj_path = os.path.join(out, f"scene_{yr}_coastlines.geojson")
        assert os.path.exists(gj_path)
        outs.append(gj_path)

    # explicit along-shore baseline in world coords (the extracted band
    # contour is a closed loop, so auto-derivation would point transects
    # along-shore on its horizontal runs); transects then cross the band
    # perpendicular to the waterline
    baseline = "500275,3999995 500275,3999365"
    chg_dir = str(tmp_path / "chg")
    rc = change_main(outs + ["--baseline", baseline,
                             "--spacing", "100", "--length", "800",
                             "--output-dir", chg_dir])
    assert rc == 0
    with open(os.path.join(chg_dir, "shoreline_change.json")) as f:
        res = json.load(f)
    assert res["units"] == "m"
    rates = [r for r in res["rates"] if r == r]
    # the identical jagged boundary shifts exactly 6 px in 3 years at
    # 10 m pixels -> every crossing moves exactly 20 m/yr
    assert rates and all(abs(abs(r) - 20.0) < 1e-6 for r in rates), res["rates"]
    assert len(rates) >= 4


def test_shoreline_change_world_coordinates():
    """Composing with the GeoJSON pixel→world mapping yields rates in
    metres/year: 2 px/yr at 10 m pixels = 20 m/yr."""
    from coastline.infer.geojson import pixel_to_world

    gt = [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]
    trs_px = [[[0, 5], [40, 5]]]
    trs = [pixel_to_world(t, gt) for t in trs_px]
    series = []
    for yr, x in ((2000.0, 10), (2001.0, 12), (2002.0, 14)):
        line_px = [[x, 0], [x, 10]]
        series.append({"date": yr, "coastlines": [pixel_to_world(line_px, gt)]})
    res = shoreline_change(series, trs)
    assert res["rates"][0] == pytest.approx(20.0)


def test_decimal_year_numeric_strings():
    """--dates advertises decimal years; plain-year and decimal-year
    STRINGS must parse instead of crashing in fromisoformat."""
    from coastline.infer.change import decimal_year

    assert decimal_year("2019") == 2019.0
    assert decimal_year("2019.5") == 2019.5
    assert abs(decimal_year("2019-07-02") - 2019.5) < 0.01


def test_change_cli_inputs_aligned_with_sorted_dates(tmp_path):
    """Artifacts passed out of date order: the JSON's 'inputs' list must be
    re-sorted to align row-for-row with 'dates'/'positions'."""
    import json

    import numpy as np

    from coastline.cli.change import main

    # horizontal shorelines at y=30 (2024) and y=10 (2019), passed in
    # REVERSED date order
    for year, y in ((2024, 30.0), (2019, 10.0)):
        payload = {"coastlines": [[[-50.0, y], [50.0, y]]]}
        with open(tmp_path / f"{year}_coastlines.json", "w") as f:
            json.dump(payload, f)
    out = tmp_path / "out"
    rc = main([str(tmp_path / "2024_coastlines.json"),
               str(tmp_path / "2019_coastlines.json"),
               "--baseline", "0,0 40,0", "--spacing", "10",
               "--length", "200", "--output-dir", str(out)])
    assert rc == 0
    with open(out / "shoreline_change.json") as f:
        res = json.load(f)
    assert res["dates"] == [2019.0, 2024.0]
    assert [("2019" in p) for p in res["inputs"]] == [True, False]
    # positions row 0 = the 2019 shoreline: transects run (x,-100)->(x,100),
    # so a y=10 shoreline sits at chainage 110; 2024's y=30 at 130
    pos = np.asarray(res["positions"], dtype=np.float64)
    v0, v1 = ~np.isnan(pos[0]), ~np.isnan(pos[1])
    assert v0.any() and v1.any()
    assert np.allclose(pos[0][v0], 110.0)
    assert np.allclose(pos[1][v1], 130.0)


def test_change_fig_world_units_keep_natural_y_axis(tmp_path, monkeypatch):
    """Pixel artifacts render in raster convention (y inverted); world
    (metre) artifacts must NOT be mirrored north-south."""
    import coastline.report.change_fig as cf

    captured = {}
    orig = cf.plt.subplots

    def spy(*a, **k):
        fig, axes = orig(*a, **k)
        captured["map_ax"] = axes[0]
        return fig, axes

    monkeypatch.setattr(cf.plt, "subplots", spy)
    series = [
        {"date": 2019.0, "coastlines": [[[0.0, 10.0], [50.0, 10.0]]]},
        {"date": 2024.0, "coastlines": [[[0.0, 30.0], [50.0, 30.0]]]},
    ]
    from coastline.infer.change import generate_transects, shoreline_change

    tr = generate_transects([[0.0, 0.0], [50.0, 0.0]], 10.0, 100.0)
    change = shoreline_change(series, tr)
    for units, inverted in (("px", True), ("m", False)):
        cf.plot_shoreline_change(series, change,
                                 str(tmp_path / f"fig_{units}.png"),
                                 units=units)
        assert captured["map_ax"].yaxis_inverted() == inverted, units
