"""Archive-member DataSource (SURVEY S6/S7, §7.3#1, §7.4).

The reference streams ~1M JSON members out of one metadata.tar.gz
strictly sequentially (code/data_processing_scripts/
ID_matching_metadata.py:68-88) because gzip has a single stream.
This Spark-4 Python DataSource breaks that constraint where the
container allows it:

- member CATALOG is built once on the driver (name/offset/size) —
  the analogue of `getnames()`;
- members are SPLIT across input partitions, so extraction is
  parallel;
- for an UNCOMPRESSED .tar every task pread()s its members straight
  at their byte offsets (true random access, no re-scan);
- for .tar.gz each task must re-stream the gzip prefix — inherent to
  the format; the docstring is the warning, the fix at scale is
  re-containering (pre-extract or per-member recompress), which
  `explode_archive_to_parquet` below does once.

Usage:
    spark.dataSource.register(TarMembersDataSource)
    df = (spark.read.format("tar_members")
          .option("path", "/data/metadata.tar.gz")
          .option("suffix", ".json").load())
    # → member: string, content: binary, size: long
"""

from __future__ import annotations

import tarfile

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType([
    StructField("member", StringType()),
    StructField("content", BinaryType()),
    StructField("size", LongType()),
])


class _MemberChunk(InputPartition):
    def __init__(self, archive: str, members: list[tuple[str, int, int]],
                 compressed: bool):
        self.archive = archive
        self.members = members  # (name, data_offset, size)
        self.compressed = compressed


class TarMembersReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tar_members requires .option('path', ...)")
        self.suffix = options.get("suffix", "")
        self.num_partitions = int(options.get("numPartitions", "16"))

    def partitions(self):
        compressed = self.path.endswith(".gz") or self.path.endswith(".tgz")
        catalog: list[tuple[str, int, int]] = []
        with tarfile.open(self.path, "r:*") as tar:
            for m in tar:
                if m.isfile() and m.name.endswith(self.suffix):
                    catalog.append((m.name, m.offset_data, m.size))
        if not catalog:
            return [_MemberChunk(self.path, [], compressed)]
        n = min(self.num_partitions, len(catalog))
        chunks = [catalog[i::n] for i in range(n)]
        # keep offset order within a chunk: sequential-friendly for gz
        chunks = [sorted(c, key=lambda t: t[1]) for c in chunks]
        return [_MemberChunk(self.path, c, compressed) for c in chunks]

    def read(self, partition: _MemberChunk):
        if not partition.members:
            return
        if partition.compressed:
            # single gzip stream: iterate members in offset order,
            # extracting only this chunk's names
            wanted = {name for name, _, _ in partition.members}
            with tarfile.open(partition.archive, "r:*") as tar:
                for m in tar:
                    if m.name in wanted:
                        f = tar.extractfile(m)
                        yield (m.name, f.read() if f else b"", m.size)
        else:
            # plain tar: direct pread at each member's data offset
            with open(partition.archive, "rb") as fh:
                for name, offset, size in partition.members:
                    fh.seek(offset)
                    yield (name, fh.read(size), size)


class TarMembersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tar_members"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return TarMembersReader(self.options)


class ZipMembersReader(DataSourceReader):
    """Zip is the EASY archive case (reference containers posts in a
    zip — analysis/preview_posts.ipynb:23): the central directory at
    the end of the file is a complete member catalog, and every
    member is compressed INDEPENDENTLY, so — unlike .tar.gz's single
    gzip stream — every task gets true random access to its share of
    members regardless of compression. The driver reads only the
    central directory; tasks open the archive and seek straight to
    their members."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zip_members requires .option('path', ...)")
        self.suffix = options.get("suffix", "")
        self.num_partitions = int(options.get("numPartitions", "16"))

    def partitions(self):
        import zipfile

        catalog: list[tuple[str, int, int]] = []
        with zipfile.ZipFile(self.path) as zf:
            for info in zf.infolist():
                if not info.is_dir() and info.filename.endswith(self.suffix):
                    # header_offset stands in the data-offset seat of
                    # the shared chunk type; zipfile re-derives the
                    # true data start per member at read time
                    catalog.append((info.filename, info.header_offset,
                                    info.file_size))
        if not catalog:
            return [_MemberChunk(self.path, [], False)]
        n = min(self.num_partitions, len(catalog))
        chunks = [catalog[i::n] for i in range(n)]
        # offset order within a chunk: sequential disk reads
        chunks = [sorted(c, key=lambda t: t[1]) for c in chunks]
        return [_MemberChunk(self.path, c, False) for c in chunks]

    def read(self, partition: _MemberChunk):
        import zipfile

        if not partition.members:
            return
        with zipfile.ZipFile(partition.archive) as zf:
            # Re-look up members by header_offset: zf.open(name) goes
            # through NameToInfo, which keeps only the LAST entry per
            # name, so duplicate member names would all read the last
            # member's bytes (ADVICE r8). Opening the ZipInfo itself
            # reads the member this catalog row actually points at.
            by_offset = {i.header_offset: i for i in zf.infolist()}
            for name, offset, size in partition.members:
                with zf.open(by_offset[offset]) as f:
                    yield (name, f.read(), size)


class ZipMembersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zip_members"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return ZipMembersReader(self.options)


def explode_archive_to_parquet(spark, archive_path: str, out_path: str,
                               *, suffix: str = "") -> None:
    """Re-container an archive once so every later query gets a
    splittable columnar scan — the scale fix for gzip's sequential
    stream (SURVEY §7.3#1). Routes .zip through the random-access
    zip source, everything else through the tar source."""
    if archive_path.endswith(".zip"):
        spark.dataSource.register(ZipMembersDataSource)
        fmt = "zip_members"
    else:
        spark.dataSource.register(TarMembersDataSource)
        fmt = "tar_members"
    (spark.read.format(fmt)
     .option("path", archive_path).option("suffix", suffix).load()
     .write.mode("overwrite").parquet(out_path))
