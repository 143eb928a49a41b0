"""COCO detection dataset — re-design of
`/root/reference/yolox/data/datasets/coco.py`, backed by the pure-python
COCO JSON parser (`yolox_tpu/data/coco_json.py`) instead of pycocotools.

Same protocol: annotations pre-loaded to memory (segmentation stripped),
boxes clipped to xyxy, class index = position in sorted category ids,
images pre-resized by r = min(target/h, target/w); `pull_item` returns
(BGR uint8 image, (N, 5) xyxy+cls labels, (h, w), img_id).
"""

from __future__ import annotations

import copy
import os

import cv2
import numpy as np

from yolox_tpu.data.coco_json import COCO
from yolox_tpu.data.dataloading import get_yolox_datadir
from yolox_tpu.data.datasets.datasets_wrapper import (
    CacheDataset,
    cache_read_img,
)


def remove_useless_info(coco: COCO):
    """Strip segmentation/license info to save memory (`coco.py:13-29`)."""
    dataset = coco.dataset
    dataset.pop("info", None)
    dataset.pop("licenses", None)
    for img in dataset.get("images", []):
        img.pop("license", None)
        img.pop("coco_url", None)
        img.pop("date_captured", None)
        img.pop("flickr_url", None)
    for anno in dataset.get("annotations", []):
        anno.pop("segmentation", None)


class CocoDataset(CacheDataset):
    def __init__(self, data_dir=None, json_file="instances_train2017.json",
                 name="train2017", img_size=(416, 416), preproc=None,
                 cache=False, cache_type="ram"):
        if data_dir is None:
            data_dir = os.path.join(get_yolox_datadir(), "COCO")
        self.data_dir = data_dir
        self.json_file = json_file

        self.coco = COCO(os.path.join(data_dir, "annotations", json_file))
        remove_useless_info(self.coco)
        self.ids = self.coco.getImgIds()
        self.num_imgs = len(self.ids)
        self.class_ids = sorted(self.coco.getCatIds())
        self.cats = self.coco.loadCats(self.coco.getCatIds())
        self._classes = tuple(c["name"] for c in self.cats)
        self.name = name
        self.img_size = img_size
        self.preproc = preproc
        self.annotations = [self.load_anno_from_ids(i) for i in self.ids]

        path_filename = [os.path.join(name, anno[3])
                         for anno in self.annotations]
        super().__init__(
            input_dimension=img_size,
            num_imgs=self.num_imgs,
            data_dir=data_dir,
            cache_dir_name=f"cache_{name}",
            path_filename=path_filename,
            cache=cache,
            cache_type=cache_type,
        )

    def __len__(self):
        return self.num_imgs

    def load_anno_from_ids(self, id_):
        im_ann = self.coco.loadImgs(id_)[0]
        width = im_ann["width"]
        height = im_ann["height"]
        anno_ids = self.coco.getAnnIds(imgIds=[int(id_)], iscrowd=False)
        annotations = self.coco.loadAnns(anno_ids)
        objs = []
        for obj in annotations:
            x1 = np.max((0, obj["bbox"][0]))
            y1 = np.max((0, obj["bbox"][1]))
            x2 = np.min((width, x1 + np.max((0, obj["bbox"][2]))))
            y2 = np.min((height, y1 + np.max((0, obj["bbox"][3]))))
            if obj["area"] > 0 and x2 >= x1 and y2 >= y1:
                obj["clean_bbox"] = [x1, y1, x2, y2]
                objs.append(obj)

        res = np.zeros((len(objs), 5))
        for ix, obj in enumerate(objs):
            cls = self.class_ids.index(obj["category_id"])
            res[ix, 0:4] = obj["clean_bbox"]
            res[ix, 4] = cls

        r = min(self.img_size[0] / height, self.img_size[1] / width)
        res[:, :4] *= r
        img_info = (height, width)
        resized_info = (int(height * r), int(width * r))
        file_name = im_ann.get("file_name", "{:012}".format(id_) + ".jpg")
        return (res, img_info, resized_info, file_name)

    def load_anno(self, index):
        return self.annotations[index][0]

    def load_resized_img(self, index):
        img = self.load_image(index)
        r = min(self.img_size[0] / img.shape[0],
                self.img_size[1] / img.shape[1])
        return cv2.resize(
            img, (int(img.shape[1] * r), int(img.shape[0] * r)),
            interpolation=cv2.INTER_LINEAR).astype(np.uint8)

    def load_image(self, index):
        file_name = self.annotations[index][3]
        img_file = os.path.join(self.data_dir, self.name, file_name)
        img = cv2.imread(img_file)
        assert img is not None, f"file named {img_file} not found"
        return img

    @cache_read_img(use_cache=True)
    def read_img(self, index):
        return self.load_resized_img(index)

    def pull_item(self, index):
        id_ = self.ids[index]
        label, origin_image_size, _, _ = self.annotations[index]
        img = self.read_img(index)
        return img, copy.deepcopy(label), origin_image_size, np.array([id_])

    @CacheDataset.mosaic_getitem
    def __getitem__(self, index):
        img, target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.input_dim,
                                       rng=self.rng)
        return img, target, img_info, img_id
