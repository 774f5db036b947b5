"""Relational operator library (SURVEY.md §2.2-2.8, §2.10).

Every public function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the module-level ``ORACLES`` SQL exactly (the driver's
correctness compare sorts columns by name before hashing values).
"""
