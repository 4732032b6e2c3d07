"""Runnable applications — the engine's equivalents of the reference's
two Spark entry points (SURVEY.md §3):

- ``ods_base_log``  ≙ OdsBaseLogApp.main (``OdsBaseLogApp.scala:22-212``)
- ``ods_base_db``   ≙ OdsBaseDbApp.main (``OdsBaseDbApp.scala:29-182``)

Each is a thin assembly of library operators with a CLI; sources are
pluggable (file landing zone by default, Kafka with --kafka). A user of
the reference runs these instead of spark-submitting the Scala jars.
"""
