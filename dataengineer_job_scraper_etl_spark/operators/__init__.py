"""Relational + north-star operators (SURVEY §2.5/§2.6/§2.8/§2.10).

Every operator here is designed for the 100 TB path first:
- small sides are broadcast, never shuffled
- candidate generation for near-dup / similarity uses LSH bucketing,
  never a cross join
- Python appears only as Arrow-batched pandas UDFs / mapInPandas, and
  only where built-ins cannot express the semantics
- no ``collect()`` inside any operator implementation.
"""
