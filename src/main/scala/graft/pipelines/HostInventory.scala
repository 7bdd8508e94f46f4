package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline §3.3 — host inventory export (`hosts_to_csv.py:16-49`).
  *
  * Reference: fetch `hostgroupmembers`, nested-loop flatten into pandas,
  * filter two hostgroups, write CSV. Here: one declarative plan —
  * explode the nested membership doc, filter, project. The explode and
  * filter run inside a single stage; nothing shuffles.
  */
object HostInventory {

  /** Input: the parsed `hostgroupmembers` document
    * (`{"hostgroup": [{hostgroup_name, members: {host: [{host_name}]}}]}`,
    * `hosts_to_csv.py:17-34`) as a DataFrame with one row per document.
    * Output: (host_name, host_group) rows for the requested groups
    * (`hosts_to_csv.py:40-43`).
    */
  def hostRows(doc: DataFrame, keepGroups: Seq[String]): DataFrame =
    doc.select(explode(col("hostgroup")).as("hg"))
      .filter(col("hg.hostgroup_name").isin(keepGroups: _*))
      .select(
        explode(col("hg.members.host.host_name")).as("host_name"),
        col("hg.hostgroup_name").as("host_group"))

  /** K2 — CSV sink (`hosts_to_csv.py:48`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    graft.sources.Sinks.writeCsv(df, path)
}
