"""Error channel (R15) and error codes.

The reference catches any per-ZIP exception, logs it, returns false, and
keeps processing the remaining files
(MetadataIngestionExecuter.java:62-73); inside the service, three named
failure modes raise with a ProcessingErrorCode
(MetadataIngestionServiceImpl.java:109 MISSING_BOOK_METADATA,
:115 INVALID_GENRE, :158 EXTRACT_ZIP).

The engine's form: a per-row error column populated inside the parse UDF /
validation joins; error rows are routed to a quarantine DataFrame instead
of aborting the batch (badRecords pattern — one bad file never kills a
100 TB ingest job).
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

# mirrors ProcessingErrorCode usage in the reference (file:line above)
MISSING_BOOK_METADATA = "MISSING_BOOK_METADATA"
INVALID_GENRE = "INVALID_GENRE"
EXTRACT_ZIP = "EXTRACT_ZIP"

QUARANTINE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("error_code", StringType(), False),
        StructField("error_msg", StringType(), True),
    ]
)
