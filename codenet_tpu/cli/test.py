"""Evaluation CLI (reference test.py).

Runs the detector over the validation split with thread-prefetched
preprocessing (reference PrefetchDataset, test.py:23-46), aggregates
per-stage timers, and calls the dataset's in-process evaluator.
"""

from __future__ import annotations

import os
import queue
import threading


from .. import config as cfg
from ..data.datasets import get_dataset
from ..engine.detector import detector_factory
from ..utils.meters import AverageMeter

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _prefetch(dataset, detector, opt, q):
    try:
        for ind in range(len(dataset)):
            img_id = dataset.images[ind]
            img_info = dataset.coco.loadImgs(ids=[img_id])[0]
            img_path = os.path.join(dataset.img_dir, img_info["file_name"])
            image = cv2.imread(img_path)
            images, meta = {}, {}
            for scale in opt.test_scales:
                if opt.task == "ddd" and "calib" in img_info:
                    # per-image calibration (reference test.py:38-40)
                    import numpy as np
                    in_meta = {"calib": np.array(img_info["calib"],
                                                 dtype=np.float32)}
                    images[scale], meta[scale] = detector.pre_process(
                        image, scale, in_meta)
                else:
                    images[scale], meta[scale] = detector.pre_process(
                        image, scale)
            q.put((img_id, {"images": images, "image": image, "meta": meta}))
    except Exception as e:  # pragma: no cover
        q.put(e)
    finally:
        q.put(None)


def prefetch_test(opt):
    Dataset = get_dataset(opt.dataset, opt.task)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS[opt.dataset])
    print(opt.heads)
    split = "val" if not opt.trainval else "test"
    dataset = Dataset(opt, split)
    detector = detector_factory(opt.task)(opt)

    q = queue.Queue(maxsize=4)
    t = threading.Thread(target=_prefetch,
                         args=(dataset, detector, opt, q), daemon=True)
    t.start()

    results = {}
    avg_time_stats = {t_: AverageMeter()
                      for t_ in ["tot", "load", "pre", "net", "dec", "post",
                                 "merge"]}
    num_iters = len(dataset)
    ind = 0
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, Exception):
            raise item
        img_id, pre_processed = item
        ret = detector.run(pre_processed)
        results[img_id] = ret["results"]
        for t_ in avg_time_stats:
            avg_time_stats[t_].update(ret[t_])
        if ind % 100 == 0:
            print("[{}/{}] ".format(ind, num_iters)
                  + "".join("|{} {:.3f} ".format(t_, avg_time_stats[t_].avg)
                            for t_ in avg_time_stats))
        ind += 1
    os.makedirs(opt.save_dir, exist_ok=True)
    return dataset.run_eval(results, opt.save_dir)


def test(opt):
    """Serial (non-prefetched) eval path (reference test.py:85-125): the
    detector loads + pre-processes each image inline; ddd passes the
    per-image calib through to pre_process."""
    Dataset = get_dataset(opt.dataset, opt.task)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS[opt.dataset])
    print(opt.heads)
    split = "val" if not opt.trainval else "test"
    dataset = Dataset(opt, split)
    detector = detector_factory(opt.task)(opt)

    results = {}
    avg_time_stats = {t_: AverageMeter()
                      for t_ in ["tot", "load", "pre", "net", "dec", "post",
                                 "merge"]}
    num_iters = len(dataset)
    for ind in range(num_iters):
        img_id = dataset.images[ind]
        img_info = dataset.coco.loadImgs(ids=[img_id])[0]
        img_path = os.path.join(dataset.img_dir, img_info["file_name"])
        if opt.task == "ddd":
            import numpy as np
            meta = {"calib": np.array(img_info["calib"], dtype=np.float32)}
            ret = detector.run(img_path, meta)
        else:
            ret = detector.run(img_path)
        results[img_id] = ret["results"]
        for t_ in avg_time_stats:
            avg_time_stats[t_].update(ret[t_])
        if ind % 100 == 0:
            print("[{}/{}] ".format(ind, num_iters)
                  + "".join("|{} {:.3f} ".format(t_, avg_time_stats[t_].avg)
                            for t_ in avg_time_stats))
    os.makedirs(opt.save_dir, exist_ok=True)
    return dataset.run_eval(results, opt.save_dir)


def main(argv=None):
    opt = cfg.parse(argv)
    if opt.not_prefetch_test:
        return test(opt)
    return prefetch_test(opt)


if __name__ == "__main__":
    main()
