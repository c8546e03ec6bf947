from a3gc_tpu.data.factory import amass, dipimu, totalcapture, transform  # noqa: F401
