package graft.jdbcstub

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, PreparedStatement,
  ResultSet, ResultSetMetaData, Timestamp, Types}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Wire-free stand-in for the reference's MSSQL target (VERDICT r10
  * task 5): a registered `java.sql.Driver` accepting
  * `jdbc:sqlserver://stub...` URLs whose proxied Connection /
  * PreparedStatement / ResultSetMetaData record exactly what Spark's
  * JDBC write path sends — the prepared INSERT text, every bound
  * parameter (setTimestamp with full nanos, setString, setDouble),
  * batch boundaries, and commits. Because the URL resolves
  * `MsSqlServerDialect`, the test exercises the REAL dialect +
  * `JdbcUtils.saveTable` machinery end-to-end; only the TDS socket is
  * fake — the PointsSinkSpec live-endpoint convention applied to K4.
  *
  * The stub models the reference's deployment mode (`load_to_db
  * .py:27-56`): tables are PRE-CREATED by a DBA — `tableExists`
  * succeeds and the schema probe reports the `datetime2`-typed
  * columns below — so Spark never issues DDL, exactly like the
  * reference's INSERT-only contract.
  */
object StubSqlServer {
  /** What the pre-created table's `SELECT * WHERE 1=0` metadata
    * reports: (name, java.sql.Types id, database type name,
    * precision, scale). datetime2(7): precision 27, scale 7.
    */
  @volatile var tableCols: Seq[(String, Int, String, Int, Int)] = Nil

  val preparedSql = new ConcurrentLinkedQueue[String]()
  val boundTimestamps = new ConcurrentLinkedQueue[(Int, Timestamp)]()
  val boundStrings = new ConcurrentLinkedQueue[(Int, String)]()
  val boundDoubles = new ConcurrentLinkedQueue[(Int, java.lang.Double)]()
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  val commits = new AtomicInteger(0)

  def reset(cols: Seq[(String, Int, String, Int, Int)]): Unit = {
    tableCols = cols
    preparedSql.clear(); boundTimestamps.clear(); boundStrings.clear()
    boundDoubles.clear(); batchSizes.clear(); commits.set(0)
  }

  private def dflt(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Float.TYPE => java.lang.Float.valueOf(0f)
    case java.lang.Double.TYPE => java.lang.Double.valueOf(0d)
    case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
    case _ => null
  }

  private def proxy[T](iface: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          (m.getName, a) match {
            case ("toString", _) => s"stub:${iface.getSimpleName}"
            case ("hashCode", _) =>
              Integer.valueOf(System.identityHashCode(p))
            case ("equals", Array(o)) =>
              java.lang.Boolean.valueOf(o eq p)
            case key if pf.isDefinedAt(key) => pf(key)
            case _ => dflt(m.getReturnType)
          }
        }
      }).asInstanceOf[T]

  private def rsMeta(): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(tableCols.size)
      case ("getColumnLabel", Array(i: Integer)) =>
        tableCols(i - 1)._1
      case ("getColumnName", Array(i: Integer)) =>
        tableCols(i - 1)._1
      case ("getColumnType", Array(i: Integer)) =>
        Integer.valueOf(tableCols(i - 1)._2)
      case ("getColumnTypeName", Array(i: Integer)) =>
        tableCols(i - 1)._3
      case ("getPrecision", Array(i: Integer)) =>
        Integer.valueOf(tableCols(i - 1)._4)
      case ("getScale", Array(i: Integer)) =>
        Integer.valueOf(tableCols(i - 1)._5)
      case ("isSigned", _) => java.lang.Boolean.TRUE
      case ("isNullable", _) =>
        Integer.valueOf(ResultSetMetaData.columnNullable)
    }

  private def resultSet(): ResultSet = proxy(classOf[ResultSet]) {
    case ("next", _) => java.lang.Boolean.FALSE // WHERE 1=0: no rows
    case ("getMetaData", _) => rsMeta()
  }

  private def statement(): PreparedStatement = {
    val pending = new AtomicInteger(0)
    proxy(classOf[PreparedStatement]) {
      case ("executeQuery", _) => resultSet()
      case ("getMetaData", _) => rsMeta()
      case ("setTimestamp", Array(i: Integer, t: Timestamp)) =>
        boundTimestamps.add((i.intValue, t)); null
      case ("setString", Array(i: Integer, s: String)) =>
        boundStrings.add((i.intValue, s)); null
      case ("setDouble", Array(i: Integer, d: java.lang.Double)) =>
        boundDoubles.add((i.intValue, d)); null
      case ("addBatch", Array()) =>
        pending.incrementAndGet(); null
      case ("executeBatch", _) =>
        val n = pending.getAndSet(0)
        batchSizes.add(Integer.valueOf(n))
        Array.fill(n)(java.sql.Statement.SUCCESS_NO_INFO)
    }
  }

  private def dbMeta(): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case ("supportsTransactions", _) => java.lang.Boolean.TRUE
      case ("supportsTransactionIsolationLevel", _) =>
        java.lang.Boolean.TRUE
      case ("getDefaultTransactionIsolation", _) =>
        Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
      case ("getDatabaseProductName", _) => "Microsoft SQL Server"
      case ("supportsDataDefinitionAndDataManipulationTransactions", _) =>
        java.lang.Boolean.TRUE
    }

  private[jdbcstub] def connection(): Connection =
    proxy(classOf[Connection]) {
      case ("prepareStatement", Array(sql: String)) =>
        preparedSql.add(sql); statement()
      case ("getMetaData", _) => dbMeta()
      case ("commit", _) => commits.incrementAndGet(); null
      case ("getTransactionIsolation", _) =>
        Integer.valueOf(Connection.TRANSACTION_READ_COMMITTED)
    }

  /** datetime2(7) column triple for [[tableCols]]. */
  def datetime2(name: String): (String, Int, String, Int, Int) =
    (name, Types.TIMESTAMP, "datetime2", 27, 7)
  def nvarchar(name: String): (String, Int, String, Int, Int) =
    (name, Types.NVARCHAR, "nvarchar", 512, 0)
  def float8(name: String): (String, Int, String, Int, Int) =
    (name, Types.DOUBLE, "float", 53, 0)
}

/** Registered through Spark's `driver` option; must have a public
  * no-arg constructor (Spark wraps it in a `DriverWrapper`).
  */
class StubSqlServerDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:sqlserver://stub")
  override def connect(url: String,
      info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null else StubSqlServer.connection()
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties)
      : Array[java.sql.DriverPropertyInfo] = Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException("stub")
}
