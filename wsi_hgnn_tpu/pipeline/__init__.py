"""WSI pipeline: tiling, patch loading, graph construction, splits."""
from .construct import GraphConstructor, construct_all, make_encoder, random_encoder
from .patches import iter_patch_batches, list_patches, load_patch
from .splits import generate_splits, write_split_lists
from .tiler import DeepZoomStaticTiler, PilDeepZoom, nested_patches, tile_slides

__all__ = [
    "GraphConstructor",
    "construct_all",
    "make_encoder",
    "random_encoder",
    "iter_patch_batches",
    "list_patches",
    "load_patch",
    "generate_splits",
    "write_split_lists",
    "DeepZoomStaticTiler",
    "PilDeepZoom",
    "nested_patches",
    "tile_slides",
]
