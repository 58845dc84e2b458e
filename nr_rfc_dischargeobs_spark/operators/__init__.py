"""Core engine operators (SURVEY.md §2.2-2.6), parameterized over column
names so the same implementations serve the canonical observation table
(FIXTURES.md F7), the driver's ``events`` stand-in, and any conformed source.

Design rules (SURVEY.md §4): every operator is a pure DataFrame→DataFrame
transformation built from Catalyst-visible expressions — no Python
row-at-a-time UDFs, no driver-side collect in the data path.  The single
exception is the rising/falling recurrence (``recurrence.py``), a grouped-map
Pandas UDF because its output depends on its own prior output.
"""
