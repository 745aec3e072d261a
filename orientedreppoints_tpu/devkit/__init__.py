from . import dota2coco, dota_utils, evaluation, hrsc, img_split, polygon, prepare, result_merge
