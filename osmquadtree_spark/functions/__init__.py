# NOTE: submodules are imported lazily by callers — udfs.py builds pandas
# UDFs via factories because decoration requires an active SparkSession.
