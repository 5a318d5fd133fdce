from codlad_tpu.parallel.sequence import ring_knn, seq_all_gather  # noqa: F401
