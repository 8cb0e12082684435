"""Geo query families re-expressed Spark-first.

Sub-modules mirror the reference's capability families (SURVEY.md §2):

- ``fixture``  — deterministic `shapes` table (portable SQL over `customer`)
- ``geometry`` — haversine / mile→degree Column expressions (geometry.py:7-75)
- ``lookup``   — point lookups & conditional projections (geo_manager.py:61-165)
- ``radius``   — radius search + pair distance (geo_manager.py:218-437)
- ``fuzzy``    — trigram fuzzy search pipeline (geo_manager.py:440-619, fuzzy.py)
- ``ingest``   — JSON→Parquet ingest, versioned layout, postings build
"""
