"""Engine operators — compositions of DataFrame primitives.

Each operator is a plain function DataFrame -> DataFrame so Catalyst
sees one logical plan end-to-end (filters push through these calls;
nothing materializes early).
"""
