from .mutex import seg_mutex, mws_segmentation
from .watershed import (
    seeded_watershed, get_seeds, watershed_from_affs,
    distance_transform_watershed,
)
from .agglomerate import agglomerate, seg_waterz
from .multicut import mc_baseline, multicut_multi
from .merge_small import (
    merge_small_object, merge_func, remove_small_object,
    merge_small_segments,
)
