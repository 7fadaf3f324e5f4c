"""Pure-numpy TIFF/COG layer (no rasterio/tifffile/PIL in the sandbox).

``writer`` synthesizes deterministic GeoTIFF fixtures (the reference's own
pattern: it writes its one network-free test input in-code,
/root/reference/src/io/geotiff.rs:254-271).

``reader`` re-implements, in numpy, exactly the decode semantics the reference
asserts: dtype dispatch (src/io/geotiff.rs:50-60), band-count from color type
(:67-83), first-IFD-only decode (:46), direct (band,h,w) reshape (:183-199),
affine from ModelPixelScale+ModelTiepoint with y-negation (:117-143), and
pixel-center half-open coordinate axes (:155-178).
"""

from cog3pio_spark.tiff.reader import (  # noqa: F401
    CogReader,
    TiffDecodeError,
    read_geotiff,
)
from cog3pio_spark.tiff.writer import write_tiff  # noqa: F401
