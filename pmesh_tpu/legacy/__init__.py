"""Deprecated compatibility APIs.

Mirrors the reference's legacy layer (SURVEY.md section 2, components
#16-19, #22): the stateful v0 ParticleMesh (pmesh/particlemesh.py),
the TransferFunction chain library (pmesh/transfer.py), the chunked
CIC/TSC painters (pmesh/cic.py, tsc.py) and the MPI-era tools
(pmesh/tools.py).  All emit DeprecationWarning and delegate to the
modern functional API.
"""
