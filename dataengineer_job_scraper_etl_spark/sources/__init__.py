"""Custom sources (SURVEY §2.1): the scrape source runs fetch+parse
executor-side via mapInPandas; everything file-shaped lives in io.py.
"""
