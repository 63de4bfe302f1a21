"""The flagship end-to-end pipeline (the north-star composition).

pages -> geocode -> cellify -> PIP join (broadcast STRtree actor pool)
-> per-tile pixel partials -> groupby(tile) rasterize -> ColorStage.

One streaming Dataset: no stage materializes the corpus; the only
all-to-all exchange is the groupby over pre-summed (tile_key, pix)
partials. Used by ``__ray_entry__.entry()`` (sf0.001) and ``bench.py``
(sf0.1 with replication).
"""

import pyarrow as pa

from ..sources.polygons import make_admin_polygons
from ..stages.color_stage import ColorStage
from ..stages.pip_stage import PIPJoinStage
from .geo import cellified
from .tiles import DEFAULT_OPS, DEFAULT_ZOOM, render_tiles_from


def flagship(sf_dir, replicate=1, ops=DEFAULT_OPS, z=DEFAULT_ZOOM, concurrency=4):
    """Corpus -> joined -> rasterized -> color-corrected tiles Dataset."""
    from ..color import parse_operations

    parse_operations(ops)  # validate the program before any work launches
    pts = cellified(sf_dir, keep_columns=["url", "lat", "lon"], replicate=replicate)
    joined = pts.map_batches(
        PIPJoinStage,
        fn_constructor_args=(make_admin_polygons(), "left"),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    tiles = render_tiles_from(joined, z)
    return tiles.map_batches(
        ColorStage,
        fn_constructor_args=(ops,),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=64,
    )
