from .sbd import (
    best_dice, symmetric_best_dice, symmetric_best_dice_max,
    diff_fg_labels, abs_diff_fg_labels, fgbg_dice,
)
from .voi_arand import voi, adapted_rand_error
from .bbbc import agg_jc_index, pixel_f1, get_fast_pq, remap_label
