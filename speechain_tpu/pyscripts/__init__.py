"""Data-preparation and housekeeping scripts (the reference's
``datasets/pyscripts`` + ``speechain/pyscripts`` layer): vocabulary
generation, offline feature/length/pitch extraction, MFA duration parsing,
wave downsampling, data packaging, speaker-embedding extraction.

Each module is runnable: ``python -m speechain_tpu.pyscripts.<name> --help``.
"""
