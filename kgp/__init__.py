"""kgp — PySpark-native knowledge-graph construction engine.

From-scratch rebuild (NOT a port) of the capabilities of
WillongWang/Knowledge_Graph_pipeline-NER-RE-CR-EL-KGAT as idiomatic Spark
DataFrame dataflow. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
