from .dataset import DatasetManager, load_coco_json, rotated_box_anno_to_xywha
from .mapper import DatasetMapper
from .loader import build_train_loader, build_test_loader, PaddedBatchBuilder
