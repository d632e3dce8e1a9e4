"""In-process evaluators: VOC AP, COCO AP, KITTI AP.

The reference shells out (os.system reval.py, a C++ KITTI binary) and
depends on pycocotools; these are self-contained numpy ports producing the
same metrics.
"""
