"""TPU-fusable segmentation / image ops.

Everything here is shape-static and jittable, so the whole
attention -> smooth -> blend -> threshold -> stitch post-processing chain of the
reference (which round-trips GPU->CPU per image via cv2/skimage/sklearn) fuses
into a single XLA graph on TPU.
"""
