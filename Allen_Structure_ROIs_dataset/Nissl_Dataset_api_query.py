#!/usr/bin/env python
"""Query the Allen RMA REST API for NISSL coronal section data sets
(rebuild of the reference's Nissl_Dataset_api_query.py)."""

from __future__ import annotations

QUERY_URL = (
    "http://api.brain-map.org/api/v2/data/query.json?criteria="
    "model::SectionDataSet,rma::criteria,[failed$eq'false'],"
    "products[abbreviation$eq'Mouse'],treatments[name$eq'NISSL'],"
    "plane_of_section[name$eq'coronal'],"
    # without the paging options RMA returns only its default first page of
    # 25 records; the reference requests the full set
    # (Nissl_Dataset_api_query.py:8-10)
    "rma::options[start_row$eq0][num_rows$eq1000]"
)


def query_nissl_coronal_datasets(url: str = QUERY_URL):
    """Returns the list of section data set records (requires network)."""
    import json
    import urllib.request

    with urllib.request.urlopen(url) as r:
        payload = json.load(r)
    if not payload.get("success", False):
        raise RuntimeError(f"Allen API query failed: {payload}")
    return payload["msg"]


if __name__ == "__main__":
    for rec in query_nissl_coronal_datasets():
        print(rec["id"], rec.get("specimen_id"), rec.get("plane_of_section_id"))
