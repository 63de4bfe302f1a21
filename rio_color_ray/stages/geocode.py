"""Geocode stage: extract (lat, lon) from page html — stateless, vectorized.

``pages.map_batches(geocode_batch, batch_format="pyarrow")``. The
extraction is a single RE2 ``pc.extract_regex`` over the html column (C
vectorized, no Python per row), followed by vectorized float casts. Pages
without a geo marker get null lat/lon and are dropped by the caller when
the pipeline requires coordinates.

The ``text`` column is carried through untouched — the byte-identical
text-per-url invariant (BASELINE.json input_hint) is preserved because
this stage never rewrites it.
"""

import pyarrow as pa
import pyarrow.compute as pc

_GEO_PATTERN = r'geo\.position" content="(?P<glat>-?[0-9]+\.[0-9]{6});(?P<glon>-?[0-9]+\.[0-9]{6})"'


def geocode_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> batch + (lat, lon) float64 columns."""
    html_str = pc.cast(batch.column("html"), pa.string())
    hits = pc.extract_regex(html_str, _GEO_PATTERN)
    lat = pc.cast(pc.struct_field(hits, "glat"), pa.float64())
    lon = pc.cast(pc.struct_field(hits, "glon"), pa.float64())
    return batch.append_column("lat", lat).append_column("lon", lon)
