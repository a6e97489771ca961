"""Sources & sinks (SURVEY §2.1).

The reference's substrate is files: per-post HTML, CSV listings,
tar.gz'd JSON metadata, append-only status logs. Everything here
re-expresses those as declarative Spark scans — declared schemas,
tolerant modes, and a custom Python DataSource for archive members
(the one place the substrate genuinely fights Spark, SURVEY §7.3).
"""
