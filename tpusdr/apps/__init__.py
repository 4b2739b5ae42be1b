"""tpusdr.apps — command-line receiver applications.

Parity with the reference's L6 applications (SURVEY.md section 2):
nbfm_test/am_test/fm_simpletest/145.45_digital_signal_to_audio become one
configurable CLI (`python -m tpusdr.apps.receive`) with actual flags — the
reference hardcodes every constant (nbfm_test.cpp:414-431).
"""
