#!/usr/bin/env python
"""Allen CCF structure-ROI dataset generator.

Rebuild of the reference generator (same capability, injectable design):
walk 3D structure masks in the CCF reference space, synchronize reference
coordinates to section images via the AllenSDK, download deduplicated ROI
crops per structure, and write a tab-separated manifest
(ROIs_description.csv).

The geometry (mask-walking stride, z subsampling, coordinate mapping) and
the overlap deduplication (<100 px on the same section image) are pure
functions, unit-testable without the AllenSDK; the SDK/image APIs are
injected so offline environments can use fakes. Host-only code — no TPU
work involved (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass, field

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_SECTION_DATA_SET_IDS = [
    70928385, 71249069, 71836787, 71836878, 72081516, 72119628, 73520964,
    73521804, 73636030, 73771240, 75042244, 75650864, 76135829, 77413698,
    79488931, 79591637, 79912554,
]
DEFAULT_STRUCTURE_IDS = [1056, 507, 726]  # ANcr1, MOB, DG


def mask_walk_coords(mask_shape, resolution: int, width: int, height: int, z_step: int = 4):
    """Yield (k, i, j) grid indices and (x, y, z) reference-space coords for a
    3D mask walk.

    Strides are 2*roi/resolution (ROIs download at downsample=1, i.e. double
    size, so doubled steps avoid overlaps); the z axis subsamples every
    ``z_step`` sections (25 um spacing).
    """
    depth, mw, mh = mask_shape
    w = int(width * 2 / resolution)
    h = int(height * 2 / resolution)
    for k in range(depth // z_step):
        for i in range(mw // w):
            for j in range(mh // h):
                yield (
                    (k * z_step, i * w, j * h),
                    {
                        "x": k * 25 * z_step,
                        "y": i * w * resolution - height / 2,
                        "z": j * h * resolution - width / 2,
                    },
                )


def is_overlapping(rows, section_image_id, x_sec, y_sec, threshold: int = 100) -> bool:
    """True when an already-downloaded ROI on the same section image lies
    within ``threshold`` px on both axes (the sync API snaps nearby reference
    points to the same section coordinates)."""
    for item in rows:
        if item["section_image_id"] == section_image_id and (
            abs(item["x_sec"] - x_sec) < threshold and abs(item["y_sec"] - y_sec) < threshold
        ):
            return True
    return False


@dataclass
class RoiDatasetGenerator:
    image_api: object
    sync_api: object
    path: str = "./"
    width: int = 334
    height: int = 334
    resolution: int = 25
    reference_space_id: int = 9  # 9 coronal, 10 sagittal
    images_per_structure: int = 10
    rows: list = field(default_factory=list)

    def download_roi(self, section_image_id, x, y, destination_path):
        os.makedirs(os.path.dirname(destination_path), exist_ok=True)
        self.image_api.download_section_image(
            section_image_id, destination_path, top=y, left=x,
            width=self.width, height=self.height,
            downsample_dimensions=False, downsample=1,
        )

    def fetch_reference_point(self, x, y, z, section_data_set_ids, structure_acronym,
                              structure_id, remaining):
        """One reference-space point -> deduplicated section-image ROIs."""
        response = self.sync_api.get_reference_to_image(
            x=x, y=y, z=z, section_data_set_ids=section_data_set_ids,
            reference_space_id=self.reference_space_id,
        )
        for row in response:
            body = row["image_sync"]
            # documented delta: the overlap check is per-row. The reference
            # sets a sticky `overlap` flag it never resets inside this loop
            # (its `overlap == False` comparison is a no-op statement), so
            # after the FIRST overlapping row it silently skips every later
            # row of the response too; here each row is judged on its own.
            if is_overlapping(self.rows, body["section_image_id"], body["x"], body["y"]):
                print("Warning: overlaped images will not be saved")
                continue
            directory = os.path.join(self.path, f"{structure_acronym}_{structure_id}")
            fname = f"si-{body['section_image_id']}_x-{body['x']}_y-{body['y']}.jpg"
            destination = os.path.join(directory, fname)
            print(destination)
            self.download_roi(body["section_image_id"], body["x"], body["y"], destination)
            self.rows.append(
                {
                    "section_data_set_id": body["section_data_set_id"],
                    "section_image_id": body["section_image_id"],
                    "x_sec": body["x"],
                    "y_sec": body["y"],
                    "structure_acronym": structure_acronym,
                    "structure_id": structure_id,
                    "x_ref": x,
                    "y_ref": y,
                    "z_ref": z,
                    "destination": destination,
                }
            )
            remaining -= 1
            self.save_manifest()
        return remaining

    def save_manifest(self, path="ROIs_description.csv"):
        import pandas as pd

        pd.DataFrame(self.rows).to_csv(path, sep="\t", encoding="utf-8", index=False)

    def rois_for_structure(self, mask, section_data_set_ids, structure_acronym, structure_id):
        remaining = self.images_per_structure
        count = 0
        for (k, i, j), ref in mask_walk_coords(mask.shape, self.resolution, self.width, self.height):
            if mask[k][i][j] > 0:
                if remaining <= 0:
                    return count
                remaining = self.fetch_reference_point(
                    x=ref["x"], y=ref["y"], z=ref["z"],
                    section_data_set_ids=section_data_set_ids,
                    structure_acronym=structure_acronym, structure_id=structure_id,
                    remaining=remaining,
                )
                count += 1
        return count

    def generate(self, section_data_set_ids, structure_ids, tree, rsp):
        total = 0
        for st in tree.get_structures_by_id(structure_ids):
            mask = rsp.make_structure_mask([st["id"]])
            total += self.rois_for_structure(mask, section_data_set_ids, st["acronym"], st["id"])
        return total


def main():
    parser = argparse.ArgumentParser(
        description="Download structure ROIs from Allen section data sets via 3D CCF masks."
    )
    parser.add_argument("-s", "--structure_data_set_ids_list", nargs="*", type=int,
                        default=DEFAULT_SECTION_DATA_SET_IDS)
    parser.add_argument("-i", "--structure_ids_list", nargs="*", type=int, default=DEFAULT_STRUCTURE_IDS)
    parser.add_argument("-r", "--reference_space_id", type=int, default=9)
    parser.add_argument("-R", "--resolution", type=int, default=25)
    parser.add_argument("-w", "--width", type=int, default=334)
    parser.add_argument("-H", "--height", type=int, default=334)
    parser.add_argument("-N", "--number_of_Imagers_per_class", type=int, default=10)
    parser.add_argument("-p", "--path", type=str, default="./")
    args = parser.parse_args()

    try:
        from allensdk.api.queries.image_download_api import ImageDownloadApi
        from allensdk.api.queries.synchronization_api import SynchronizationApi
        from allensdk.core.reference_space_cache import ReferenceSpaceCache
    except ImportError:
        raise SystemExit(
            "allensdk is required to query the Allen Institute APIs "
            "(pip install allensdk); the geometry/dedup logic is unit-tested offline."
        )

    rspc = ReferenceSpaceCache(args.resolution, "annotation/ccf_2017",
                               manifest=os.path.join("allen_ccf", "manifest.json"))
    tree = rspc.get_structure_tree(structure_graph_id=1)
    rspc.get_annotation_volume()
    rsp = rspc.get_reference_space()

    gen = RoiDatasetGenerator(
        image_api=ImageDownloadApi(), sync_api=SynchronizationApi(), path=args.path,
        width=args.width, height=args.height, resolution=args.resolution,
        reference_space_id=args.reference_space_id,
        images_per_structure=args.number_of_Imagers_per_class,
    )
    count = gen.generate(args.structure_data_set_ids_list, args.structure_ids_list, tree, rsp)
    print(f"done: {count} reference points visited, {len(gen.rows)} ROIs saved")


if __name__ == "__main__":
    main()
