"""Georeferenced coastline export (GeoJSON) — beyond-reference capability.

The reference mimics CoastSat's *figure* (`/root/reference/
predict_coastline.py:659-846`) but its polyline artifact stays in pixel
coordinates (`:620-657`); the real CoastSat workflow's deliverable is the
shoreline in WORLD coordinates. The GeoTIFF ingest already carries the
raster's geotransform + projection (data/geotiff.py `read_bands`), so when
a source image has one, the extractor also writes
``{base}_coastlines.geojson``: a FeatureCollection of LineStrings in the
raster's CRS, one feature per extracted coastline.

Coordinate convention: polylines live at native raster resolution as
(x=col, y=row) integer vertices (infer/contours.py); world coordinates use
the GDAL geotransform applied at PIXEL CENTERS (col+0.5, row+0.5), the
CoastSat/GDAL ``GT`` convention:

    X = GT0 + (col+0.5)*GT1 + (row+0.5)*GT2
    Y = GT3 + (col+0.5)*GT4 + (row+0.5)*GT5

GeoJSON (RFC 7946) mandates WGS84 for interchange; raster CRSs are usually
projected (e.g. UTM for Sentinel-2), so the projection is recorded in the
collection's ``properties.crs_wkt`` foreign member instead of silently
mislabelling the coordinates — consumers reproject with their GIS stack.
"""

from typing import List, Optional, Sequence


def pixel_to_world(points, geo_transform) -> List[List[float]]:
    """Map [[col,row], ...] pixel vertices to world coords at pixel centers."""
    g0, g1, g2, g3, g4, g5 = geo_transform
    out = []
    for col, row in points:
        c, r = col + 0.5, row + 0.5
        out.append([g0 + c * g1 + r * g2, g3 + c * g4 + r * g5])
    return out


def coastlines_to_geojson(
    coastlines: Sequence[Sequence[Sequence[float]]],
    geo_transform: Sequence[float],
    projection: Optional[str] = None,
    properties: Optional[dict] = None,
) -> Optional[dict]:
    """Build a GeoJSON FeatureCollection of LineString coastlines.

    Returns None when `geo_transform` is absent/degenerate (no georef) —
    callers skip the artifact rather than writing pixel coords labelled as
    world coords. Coastlines with < 2 points cannot form a LineString and
    are dropped.
    """
    if geo_transform is None or len(geo_transform) != 6:
        return None
    if (geo_transform[1] == 0 and geo_transform[2] == 0) or (
            geo_transform[4] == 0 and geo_transform[5] == 0):
        return None  # degenerate row (no pixel size on X or Y): not a
        # georeferenced raster — a zero Y row would silently collapse
        # every vertex to Y=GT3
    if tuple(geo_transform) == (0, 1, 0, 0, 0, 1):
        return None  # the identity transform GDAL GetGeoTransform() and
        # rasterio both report for UNgeoreferenced rasters — mapping
        # through it would write pixel coords labelled as world coords
    features = []
    for i, line in enumerate(coastlines):
        if len(line) < 2:
            continue
        features.append(
            {
                "type": "Feature",
                "properties": {"coastline_id": i, "n_vertices": len(line)},
                "geometry": {
                    "type": "LineString",
                    "coordinates": pixel_to_world(line, geo_transform),
                },
            }
        )
    top_props = {"geo_transform": list(geo_transform)}
    if projection:
        top_props["crs_wkt"] = projection
    if properties:
        top_props.update(properties)
    return {
        "type": "FeatureCollection",
        "properties": top_props,
        "features": features,
    }
