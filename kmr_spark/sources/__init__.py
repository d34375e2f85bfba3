"""Sources and sinks (reference SURVEY.md §2.1).

- :mod:`.files` — file enumeration, text/CSV/parquet readers, per-key
  partitioned sinks (kmr_file_enumerate / kmr_map_getline /
  kmr_save_kvs parity)
- :mod:`.pipe`  — external-program mappers/reducers over rdd.pipe
  (kmrrun / kmr_map_ms_commands parity)
"""
